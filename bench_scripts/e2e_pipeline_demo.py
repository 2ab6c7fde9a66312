"""Sustained-trainer demo: materialized multi-hot dataset -> v2_main on TPU.

Generates synthetic 1-hot day files, materializes the multi-hot dataset on
disk (the v2 data path), then runs the full v2 trainer with the streamed
embedding path — prefetcher, native stream-work builder, H2D, device step —
and reports sustained samples/s from the epoch timer.

NOTE on this environment: host->device goes through the axon tunnel, which
is far slower than the PCIe link of a real TPU host, so the sustained
number here is a LOWER bound dominated by transfer; the device-step rate is
bench.py's number.

Usage: e2e_pipeline_demo.py [batch_size] [train_batches]
"""

import os
import sys
import tempfile
import time

import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rows_per_table = int(os.environ.get("TABLE_ROWS", 200_000))
    table_sizes = [rows_per_table] * 26
    hot_sizes = [8] * 26
    root = tempfile.mkdtemp(prefix="dlrm_e2e_")
    rng = np.random.default_rng(0)

    # synthetic processed 1-hot day files (train day + val/test day)
    t0 = time.perf_counter()
    days = []
    for d, rows in enumerate((bs * nb, 2 * bs)):
        y = (rng.random(rows) < 0.3).astype(np.int32)
        x_int = rng.integers(0, 100, (rows, 13)).astype(np.int32)
        x_cat = np.stack(
            [rng.integers(0, n, rows) for n in table_sizes], axis=1
        ).astype(np.int64)
        path = os.path.join(root, f"day_{d}.npz")
        np.savez(path, y=y, X_int=x_int, X_cat=x_cat)
        days.append(path)

    from dlrm_tpu.data.multi_hot_criteo import materialize_multihot_dataset

    out = os.path.join(root, "multihot")
    materialize_multihot_dataset(days, out, table_sizes, hot_sizes)
    print(f"materialized {bs*nb + 2*bs} rows in "
          f"{time.perf_counter()-t0:.1f}s -> {out}", flush=True)

    from dlrm_tpu import v2_main

    t0 = time.perf_counter()
    rc = v2_main.main([
        "--synthetic_multi_hot_criteo_path", out,
        "--batch_size", str(bs),
        "--embedding_dim", "128",
        "--num_embeddings_per_feature",
        ",".join(str(n) for n in table_sizes),
        "--multi_hot_sizes", ",".join(str(h) for h in hot_sizes),
        "--dense_arch_layer_sizes", "512,256,128",
        "--over_arch_layer_sizes", "1024,1024,512,256,1",
        "--adagrad",
        "--learning_rate", "0.01",
        "--embedding_impl", "stream",
        "--embedding_dtype", "bfloat16",
        "--limit_val_batches", "1",
        "--limit_test_batches", "1",
    ])
    print(f"v2_main rc={rc} wall={time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
