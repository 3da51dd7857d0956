import pytest

from pipelinerl_tpu.domains.ifeval.checkers import CHECKERS, check_instruction
from pipelinerl_tpu.domains.ifeval.dataset import load_datasets


@pytest.mark.parametrize(
    "iid,kwargs,good,bad",
    [
        ("keywords:existence", {"keywords": ["water", "sky"]}, "The water meets the sky", "dry land"),
        ("keywords:frequency", {"keyword": "go", "frequency": 2, "relation": "at least"}, "go go go", "go"),
        ("keywords:forbidden_words", {"forbidden_words": ["bad"]}, "all good here", "this is bad"),
        ("keywords:letter_frequency", {"letter": "z", "let_frequency": 2, "let_relation": "at least"}, "fuzzy zebra", "cat"),
        ("length_constraints:number_words", {"num_words": 3, "relation": "at least"}, "one two three four", "one two"),
        ("length_constraints:number_sentences", {"num_sentences": 2, "relation": "exactly"}, "One. Two.", "One. Two. Three."),
        ("length_constraints:number_paragraphs", {"num_paragraphs": 2}, "a\n***\nb", "a only"),
        ("detectable_content:number_placeholders", {"num_placeholders": 2}, "Dear [name] from [city]", "Dear someone"),
        ("detectable_content:postscript", {"postscript_marker": "P.S."}, "bye\nP.S. hello", "bye"),
        ("detectable_format:number_bullet_lists", {"num_bullets": 2}, "- a\n- b", "- a\n- b\n- c"),
        ("detectable_format:title", {}, "<<My Title>>\ntext", "My Title"),
        ("detectable_format:json_format", {}, '{"a": 1}', "not json"),
        ("detectable_format:number_highlighted_sections", {"num_highlights": 1}, "see *this* part", "nothing"),
        ("detectable_format:constrained_response", {}, "My answer is yes.", "Certainly!"),
        ("startend:quotation", {}, '"quoted fully"', 'not "quoted"'),
        ("startend:end_checker", {"end_phrase": "the end"}, "story... The End", "story continues"),
        ("change_case:english_lowercase", {}, "all lower here", "Has Caps"),
        ("change_case:english_capital", {}, "ALL CAPS", "Mixed Case"),
        ("change_case:capital_word_frequency", {"capital_frequency": 1, "capital_relation": "at least"}, "this is BIG news", "quiet words"),
        ("punctuation:no_comma", {}, "no commas here", "one, comma"),
        ("combination:repeat_prompt", {"prompt_to_repeat": "Say hi"}, "Say hi\nok: hi", "hi"),
        ("combination:two_responses", {}, "a\n******\nb", "only one"),
    ],
)
def test_checker(iid, kwargs, good, bad):
    assert check_instruction(good, iid, kwargs) is True, iid
    assert check_instruction(bad, iid, kwargs) is False, iid


def test_unknown_instruction_raises():
    with pytest.raises(KeyError):
        check_instruction("x", "not:a_checker", {})


def test_checker_registry_size():
    assert len(CHECKERS) >= 24


def test_synthetic_dataset():
    problems = load_datasets(["synthetic_ifeval"])
    assert len(problems) == 128
    p = problems[0]
    assert p["instruction_id_list"] and len(p["kwargs"]) == len(p["instruction_id_list"])
