"""In-suite MLPerf proxy convergence (VERDICT r2 next-round #4).

Runs scripts/mlperf_proxy_run.py's v1 phase in miniature: 24 generated
Criteo-format raw days (terabyte layout is fixed at 24 days, matching
data_utils.py's day_0..day_23 expectation) -> out-of-core multi-process
preprocess -> packed bins -> cli.py with MLPerf logging/bin loader/LR
policy to a REAL auc-threshold early stop, with the event sequence
asserted inside run_v1 against the reference order
(dlrm_s_pytorch.py:1487-1781).

The full-size run (1500 rows/day, threshold 0.75, plus the v2
DCN+streamed-bf16 --auroc_target phase) is scripts/mlperf_proxy_run.py's
default invocation; the v2 phase stays script-only because its one-time
interpret-mode compile (~4 min on the 1-core CI host) dwarfs the
training itself."""

import sys
import os

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
    assert rc == 0  # run_v1 asserts the threshold stop + event order
