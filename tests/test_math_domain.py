"""Math verifier, reward table, datasets, and the verifier HTTP service."""

import asyncio

import pytest

from pipelinerl_tpu.domains.math.load_datasets import load_datasets
from pipelinerl_tpu.domains.math.rollouts import (
    RewardTable,
    get_reward,
    length_penalty,
)
from pipelinerl_tpu.domains.math.verifier import (
    answers_equal,
    extract_answer,
    extract_boxed,
    grade_answer,
    normalize_answer,
    verify_countdown,
)


# -- extraction --------------------------------------------------------------


def test_extract_boxed_nested():
    assert extract_boxed(r"thus \boxed{\frac{1}{2}}") == r"\frac{1}{2}"
    assert extract_boxed(r"a \boxed{1} then \boxed{2}") == "2"
    assert extract_boxed("no box") is None


def test_extract_answer_fallbacks():
    assert extract_answer("The final answer is 42") == "42"
    assert extract_answer("<answer>7</answer>") == "7"
    assert extract_answer(r"so \boxed{x+1}") == "x+1"
    assert extract_answer("I don't know") is None


# -- equivalence -------------------------------------------------------------


@pytest.mark.parametrize(
    "pred,gold",
    [
        ("42", "42"),
        (" 42 ", "42."),
        (r"\frac{1}{2}", "0.5"),
        ("1/2", "2/4"),
        ("1,000", "1000"),
        (r"\$5", "5"),
        ("50\\%", "0.5"),
        ("(1, 2)", "(1,2)"),
        (r"\text{east}", "east"),
        ("2*3", "6"),
        (r"\sqrt{4}", "2"),
        ("-0.25", "-1/4"),
    ],
)
def test_answers_equal(pred, gold):
    assert answers_equal(pred, gold), (normalize_answer(pred), normalize_answer(gold))


@pytest.mark.parametrize(
    "pred,gold", [("41", "42"), ("1/3", "0.5"), ("(1,2)", "(2,1)"), ("east", "west")]
)
def test_answers_not_equal(pred, gold):
    assert not answers_equal(pred, gold)


def test_grade_answer_statuses():
    assert grade_answer(r"the answer is \boxed{6}", r"\boxed{6}") == "correct"
    assert grade_answer(r"\boxed{5}", "6") == "wrong"
    assert grade_answer("I cannot solve this", "6") == "no_answer"
    assert grade_answer("", "6") == "no_answer"


# -- countdown ---------------------------------------------------------------


def test_countdown():
    assert verify_countdown("<answer>(3+5)*2</answer>", [3, 5, 2], 16) == "correct"
    assert verify_countdown("<answer>3*5*2</answer>", [3, 5, 2], 16) == "wrong"
    assert verify_countdown("<answer>(3+5)*4</answer>", [3, 5, 2], 16) == "wrong"  # wrong numbers
    assert verify_countdown("no expr here", [3, 5, 2], 16) == "no_answer"


# -- rewards -----------------------------------------------------------------


def test_reward_table():
    table = RewardTable()
    assert get_reward("correct", True, table) == 1.0
    assert get_reward("correct", False, table) == 0.5
    assert get_reward("wrong", True, table) == -0.5
    assert get_reward("unparsable", False, table) == -1.0


def test_length_penalty():
    # inside the buffer window the penalty ramps to -1
    assert length_penalty(1000, 800, 100) == 0.0
    assert length_penalty(1000, 950, 100) == pytest.approx(-0.5)
    assert length_penalty(1000, 1000, 100) == pytest.approx(-1.0)
    assert length_penalty(1000, 1050, 100) == 0.0  # beyond max → handled by overflow


# -- datasets ----------------------------------------------------------------


def test_synthetic_datasets():
    problems = load_datasets(["synthetic_arithmetic", "countdown"])
    assert len(problems) == 512 + 256
    p = problems[0]
    assert set(p) >= {"task", "answer", "dataset", "domain"}
    cd = problems[-1]
    assert "numbers" in cd and "target" in cd


def test_local_file_loader(tmp_path):
    f = tmp_path / "custom.jsonl"
    f.write_text('{"problem": "What is 1+1?", "answer": "2"}\n')
    problems = load_datasets([str(f)])
    assert problems == [
        {
            "task": "What is 1+1?",
            "answer": "\\boxed{2}",
            "dataset": "custom",
            "domain": "math",
            "id": 0,
        }
    ]


def test_local_file_passthrough_standardized(tmp_path):
    # rows already carrying task/answer are kept verbatim (custom runs)
    f = tmp_path / "run.jsonl"
    f.write_text('{"task": "t", "answer": "\\\\boxed{3}", "dataset": "orig"}\n')
    (p,) = load_datasets([str(f)])
    assert p["answer"] == "\\boxed{3}" and p["dataset"] == "orig"


def test_unknown_dataset_raises():
    with pytest.raises(ValueError):
        load_datasets(["not_a_dataset_xyz"])


# -- per-family normalizers over recorded fixture rows (no network) -----------
# fixtures mirror the raw row shapes of each hub dataset; see the reference
# processors in /root/reference/pipelinerl/domains/math/load_datasets.py:24-139


def test_normalize_eurus():
    from pipelinerl_tpu.domains.math.load_datasets import normalize_eurus

    row = {
        "ability": "math",
        "data_source": "numina",
        "prompt": [
            {"role": "system", "content": "be brief"},
            {
                "role": "user",
                "content": "Find x.\n\nPresent the answer in LaTex format: \\boxed{Your answer}",
            },
        ],
        "reward_model": {"ground_truth": "42"},
    }
    out = normalize_eurus(row)
    assert out == {"task": "Find x.", "answer": "\\boxed{42}"}
    assert normalize_eurus({**row, "ability": "code"}) is None


def test_normalize_math_variants():
    from pipelinerl_tpu.domains.math.load_datasets import normalize_math

    # MATH-500 style: problem + answer + subject
    out = normalize_math(
        {"problem": "p?", "answer": "7", "level": "Level 3", "subject": "algebra"}
    )
    assert out["answer"] == "\\boxed{7}" and out["type"] == "algebra"
    # already-boxed answers are not double-boxed
    assert normalize_math({"problem": "p", "answer": "\\boxed{1}"})["answer"] == "\\boxed{1}"
    # hendrycks style: problem + solution only
    assert normalize_math({"problem": "p", "solution": "\\boxed{9} done"})["answer"].startswith("\\boxed{9}")
    # open-r1 style: rows math_verify could not check are dropped
    assert normalize_math({"problem": "p", "answer": "1", "correctness_math_verify": [False]}) is None
    assert normalize_math({"no_problem": True}) is None


def test_normalize_gsm8k():
    from pipelinerl_tpu.domains.math.load_datasets import normalize_gsm8k

    out = normalize_gsm8k({"question": "q?", "answer": "steps...\n#### 18"})
    assert out == {"task": "q?", "answer": "18"}
    assert normalize_gsm8k({"question": "q", "answer": "no marker"}) is None


def test_normalize_competition_and_limo():
    from pipelinerl_tpu.domains.math.load_datasets import (
        normalize_competition,
        normalize_limo,
    )

    assert normalize_competition({"problem": "p", "answer": 204}) == {
        "task": "p",
        "answer": "\\boxed{204}",
    }
    assert normalize_limo({"question": "q", "answer": "5"})["answer"] == "\\boxed{5}"


def test_normalize_open_reasoner():
    from pipelinerl_tpu.domains.math.load_datasets import normalize_open_reasoner

    row = {"0": {"value": "task text"}, "1": {"ground_truth": {"value": "11"}}}
    assert normalize_open_reasoner(row) == {"task": "task text", "answer": "\\boxed{11}"}
    assert normalize_open_reasoner({"0": {}}) is None


def test_normalize_countdown_strips_chat_template():
    from pipelinerl_tpu.domains.math.load_datasets import normalize_countdown

    row = {
        "prompt": [
            {
                "content": "<|im_start|>system\nsys<|im_end|>\n<|im_start|>user\n"
                "Make 24 from [2, 3, 4].<|im_end|>\n<|im_start|>assistant"
            }
        ],
        "target": 24,
        "nums": [2, 3, 4],
    }
    out = normalize_countdown(row)
    assert out["task"] == "Make 24 from [2, 3, 4]."
    assert out["answer"] == "countdown-24-[2, 3, 4]"


def test_registry_upsample_and_url_filter():
    from pipelinerl_tpu.domains.math.load_datasets import REGISTRY, normalize_rows

    spec = REGISTRY["aime_2024"]
    assert spec.upsample == 16 and spec.url_filter == "2024"
    rows = [
        {"problem": "a", "answer": "1", "url": ".../2024-aime-i"},
        {"problem": "b", "answer": "2", "url": ".../2023-aime-ii"},
    ]
    samples = normalize_rows(rows, spec, "aime_2024")
    assert len(samples) == 16 and all(s["task"] == "a" for s in samples)
    # _original variant is not upsampled
    assert REGISTRY["aime_2024_original"].upsample == 1


def test_registry_covers_reference_families():
    from pipelinerl_tpu.domains.math.load_datasets import REGISTRY

    for name in [
        "eurus_train", "eurus_validation", "math_train", "math_test",
        "math_simplerl_train", "deepscaler_preview", "nemotron_cascade_math",
        "omni_math_500", "math_500", "open_r1_math_220k", "gpqa_main",
        "gpqa_diamond", "gsm8k_train", "gsm8k_test", "limo",
        "open_reasoner_zero_57k", "open_reasoner_zero_extended_72k",
        "open_reasoner_zero_hard_13k", "aime_2024", "aime_2025",
        "amc_2023", "amc_2023_original",
    ]:
        assert name in REGISTRY, name


def test_nonstrict_skips_unreachable(monkeypatch, caplog):
    import sys

    # the package __init__ re-exports the function under the same name,
    # shadowing the submodule attribute — resolve via sys.modules
    ld = sys.modules["pipelinerl_tpu.domains.math.load_datasets"]

    def boom(spec):
        raise OSError("no egress")

    monkeypatch.setattr(ld, "_fetch_rows", boom)
    problems = ld.load_datasets(["math_500", "synthetic_arithmetic"], strict=False)
    assert len(problems) == 512  # math_500 skipped, synthetic loaded
    with pytest.raises(OSError):
        ld.load_datasets(["math_500"], strict=True)


# -- verifier HTTP service ---------------------------------------------------


def test_verifier_service_roundtrip():
    import aiohttp

    from pipelinerl_tpu.domains.math.verifier_api import MathEnvironment, verify_answer_rpc

    async def scenario():
        env = MathEnvironment()
        runner = await env.run(host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        try:
            async with aiohttp.ClientSession() as session:
                ok = await verify_answer_rpc(
                    session, "127.0.0.1", port, r"\boxed{4}", r"\boxed{4}"
                )
                wrong = await verify_answer_rpc(
                    session, "127.0.0.1", port, r"\boxed{5}", r"\boxed{4}"
                )
                cd = await verify_answer_rpc(
                    session, "127.0.0.1", port, "<answer>2*8</answer>", "",
                    extra={"numbers": [2, 8], "target": 16},
                )
                async with session.get(f"http://127.0.0.1:{port}/health") as r:
                    health = await r.json()
        finally:
            await runner.cleanup()
        return ok, wrong, cd, health

    ok, wrong, cd, health = asyncio.run(scenario())
    assert ok == "correct" and wrong == "wrong" and cd == "correct"
    assert health["status"] == "ok"
