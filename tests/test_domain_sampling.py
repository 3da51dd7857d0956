import random

import pytest

from pipelinerl_tpu.domain_sampling import (
    DomainWeightedSampler,
    load_multidomain,
)


def make_problems():
    return [
        *({"id": i, "domain": "math"} for i in range(10)),
        *({"id": i, "domain": "guessing"} for i in range(10)),
    ]


def test_static_weights_roughly_respected():
    sampler = DomainWeightedSampler(
        make_problems(), {"math": 3.0, "guessing": 1.0}, rng=random.Random(0),
        adaptive=False,
    )
    counts = {"math": 0, "guessing": 0}
    for _ in range(2000):
        counts[sampler.sample()["domain"]] += 1
    assert counts["math"] / 2000 == pytest.approx(0.75, abs=0.05)


def test_adaptive_boosts_underrepresented():
    sampler = DomainWeightedSampler(
        make_problems(), {"math": 1.0, "guessing": 1.0}, rng=random.Random(1)
    )
    # math completes 9x more often than guessing → guessing gets boosted
    for _ in range(90):
        sampler.record_completion("math")
    for _ in range(10):
        sampler.record_completion("guessing")
    counts = {"math": 0, "guessing": 0}
    for _ in range(2000):
        counts[sampler.sample()["domain"]] += 1
    assert counts["guessing"] > counts["math"] * 2


def test_adaptive_waits_for_min_completions():
    sampler = DomainWeightedSampler(
        make_problems(), {"math": 1.0, "guessing": 1.0}, rng=random.Random(2)
    )
    for _ in range(20):
        sampler.record_completion("math")
    # under 50 completions → still static 50/50
    counts = {"math": 0, "guessing": 0}
    for _ in range(2000):
        counts[sampler.sample()["domain"]] += 1
    assert counts["math"] / 2000 == pytest.approx(0.5, abs=0.06)


def test_validation_errors():
    with pytest.raises(ValueError):
        DomainWeightedSampler(make_problems(), {})
    with pytest.raises(ValueError):
        DomainWeightedSampler(make_problems(), {"math": 1.0})  # missing guessing
    with pytest.raises(ValueError):
        DomainWeightedSampler(
            make_problems(), {"math": 1.0, "guessing": 1.0, "tir": 1.0}
        )  # unknown domain


def test_load_multidomain():
    problems = load_multidomain(["guessing::train", "math::synthetic_arithmetic"])
    domains = {p["domain"] for p in problems}
    assert domains == {"guessing", "math"}
    with pytest.raises(ValueError):
        load_multidomain(["no_double_colon"])
