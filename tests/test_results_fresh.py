"""RESULTS.md freshness gate (VERDICT r3 weak #1 / next-round #2).

The reference publishes its measured story as the final truth
(``/root/reference/README.md:90-96``); rounds 2 and 3 both re-recorded
JSONLs without regenerating the human-facing table. This test re-renders
RESULTS.md from the committed records and fails on any drift, making the
record->report step unskippable at commit time.
"""

import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).parent.parent


@pytest.mark.smoke
def test_results_md_matches_records():
    sys.path.insert(0, str(ROOT / "benchmarks"))
    try:
        import summarize
    finally:
        sys.path.pop(0)
    committed = (ROOT / "benchmarks" / "RESULTS.md").read_text()
    rendered = summarize.render()
    assert committed == rendered, (
        "benchmarks/RESULTS.md is stale vs benchmarks/results/*.jsonl — "
        "run `python benchmarks/summarize.py` and commit the result")


@pytest.mark.smoke
def test_no_unpromoted_tmp_artifacts():
    """Half-promoted bench artifacts (.tmp files) must be promoted or
    deleted before commit (VERDICT r3 next-round #10)."""
    stray = list((ROOT / "benchmarks" / "results").glob("*.tmp"))
    assert not stray, f"unpromoted bench artifacts: {[p.name for p in stray]}"
