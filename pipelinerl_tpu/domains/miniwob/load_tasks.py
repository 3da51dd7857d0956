"""Task loading: (task, seed) grid over splits (reference load_tasks.py).

With BrowserGym installed the real MiniWoB task names work; offline the
``simweb.*`` simulated tasks stand in. A dataset name selects a split;
``n_seeds`` controls the seeds-per-task expansion (the reference enumerates
task × seed pairs the same way)."""

from __future__ import annotations

DOMAIN = "miniwob"

SIMWEB_SPLIT = [
    "simweb.click-button",
    "simweb.click-checkboxes",
    "simweb.enter-text",
    "simweb.choose-list",
]

# reference splits (usable when browsergym is installed; names per
# reference load_tasks.py:5-36)
DEBUG_SPLIT = [
    "miniwob.buy-ticket",
    "miniwob.bisect-angle",
    "miniwob.choose-list",
    "miniwob.click-checkboxes-large",
    "miniwob.click-checkboxes-soft",
]
EASY_SPLIT = [
    "miniwob.click-color",
    "miniwob.click-test-2",
    "miniwob.click-test-transfer",
    "miniwob.enter-password",
    "miniwob.focus-text-2",
    "miniwob.identify-shape",
    "miniwob.navigate-tree",
    "miniwob.phone-book",
    "miniwob.read-table",
    "miniwob.use-autocomplete",
]

SPLITS = {
    "simweb_train": SIMWEB_SPLIT,
    "simweb_test": SIMWEB_SPLIT,
    "debug": DEBUG_SPLIT,
    "easy": EASY_SPLIT,
}


def load_tasks(dataset_names: list[str], **loader_kwargs) -> list[dict]:
    n_seeds = int(loader_kwargs.get("n_seeds", 16))
    problems = []
    for name in dataset_names:
        tasks = SPLITS.get(name)
        if tasks is None:
            raise ValueError(f"unknown miniwob split {name!r} (have {sorted(SPLITS)})")
        seed_base = 10_000 if name.endswith("test") else 0
        for task in tasks:
            for seed in range(n_seeds):
                problems.append(
                    {
                        "task": task,
                        "seed": seed_base + seed,
                        "dataset": name,
                        "domain": DOMAIN,
                    }
                )
    return problems
