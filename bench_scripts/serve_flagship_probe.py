"""Serve the reference's Terabyte config on ONE chip via int4 prepack.

The standard Terabyte run caps tables at --max-ind-range 10M
(bench/dlrm_s_criteo_terabyte.sh): 26 tables / ~54M rows / 128-dim =
25.8 GiB fp32. int4 rowwise prepack (ops/quantized.py: 64 data bytes +
8 inline scale/bias bytes) is logically 72 B/row, PHYSICALLY 128 B/row
on the TPU's (32,128) u8 tile — still only 6.5 GiB, serving the whole
model on a single 16 GiB v5e with >9 GiB headroom. (The UNCAPPED 40M
MLPerf config is 204M rows = 26.1 GiB at the physical tile and needs 2
chips — or the group-16 packing below; see PERF_NOTES.) The state is materialized ON DEVICE (chunked
donated fills; the host/tunnel never touches it).

FULL=1 serves the UNCAPPED 204M-row flagship via the group-16 layout
(ops/quantized.py::pack_group16 — 16 rows per 1152-byte line, zero tile
waste; one lane-aligned whole-line gather per hit + a 16-way select):
13.7 GiB on one chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench_scripts/serve_flagship_probe.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.configs.presets import CRITEO_1TB_COUNTS, MULTI_HOT_SIZES
from dlrm_tpu.data.batch import Batch

ITERS = 10
BS = 8192


def main():
    import os

    full = os.environ.get("FULL", "0") not in ("", "0")
    # MULTIHOT=1: serve with the REAL ragged v2 hot sizes (1..100, 214
    # hits/sample) instead of 1-hot — tables grouped by hot size so no
    # padding gathers are paid (the grouped_embedding_bag pattern)
    multihot = os.environ.get("MULTIHOT", "0") not in ("", "0")
    hots = MULTI_HOT_SIZES if multihot else (1,) * 26
    hmax = max(hots)
    max_ind_range = None if full else 10_000_000  # terabyte preset's cap
    cfg = DLRMConfig(
        embedding_dim=128,
        table_sizes=tuple(
            int(n) if max_ind_range is None else min(int(n), max_ind_range)
            for n in CRITEO_1TB_COUNTS
        ),
        mlp_bot=(13, 512, 256, 128),
        mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=max(MULTI_HOT_SIZES) if multihot else 1,
        compute_dtype="bfloat16",
    )
    from dlrm_tpu.models.dlrm import DLRMModel

    model = DLRMModel(cfg)
    n = model.total_rows
    row_bytes = cfg.embedding_dim // 2 + 8  # int4 data + inline scale/bias
    print(f"terabyte-config rows: {n} -> int4 prepacked "
          f"{n * row_bytes / 2**30:.2f} GiB logical, "
          f"{n * 128 / 2**30:.2f} GiB at the physical u8 tile "
          f"(fp32 would be {n * 512 / 2**30:.1f} GiB)", flush=True)

    # fixed scale/bias byte pattern (scale=0.01, bias=-1.0) for every row —
    # representative dequant math without a host-side 104 GiB quantization
    sb = np.concatenate([
        np.frombuffer(np.float32(0.01).tobytes(), np.uint8),
        np.frombuffer(np.float32(-1.0).tobytes(), np.uint8),
    ])

    chunk = min(16_000_000, n)  # clamp: small table configs fit one fill

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, key, start):
        data = jax.random.randint(
            key, (chunk, cfg.embedding_dim // 2), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        rows = jnp.concatenate(
            [data, jnp.broadcast_to(jnp.asarray(sb), (chunk, 8))], axis=1
        )
        return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

    t0 = time.perf_counter()
    if full:
        # group-16 lines: 16 rows per 72*16=1152-byte line, ZERO u8-tile
        # waste -> the whole 204M-row state is 13.7 GiB physical
        line_bytes = 16 * row_bytes
        n_groups = -(-n // 16)
        gchunk = min(1_000_000, n_groups)  # lines per fill (1.07 GiB temp)
        cols = np.arange(line_bytes)
        sb_line = np.zeros(line_bytes, np.uint8)
        mask_line = (cols % row_bytes) >= row_bytes - 8
        sb_line[mask_line] = np.tile(sb, 16)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def gfill(buf, key, start):
            r = jax.random.randint(
                key, (gchunk, line_bytes), 0, 256, jnp.int32
            ).astype(jnp.uint8)
            r = jnp.where(
                jnp.asarray(mask_line)[None, :], jnp.asarray(sb_line)[None, :], r
            )
            return jax.lax.dynamic_update_slice(buf, r, (start, 0))

        packed = jnp.zeros((n_groups, line_bytes), jnp.uint8)
        gstarts = list(range(0, n_groups - gchunk, gchunk)) + [
            max(0, n_groups - gchunk)
        ]
        for i, start in enumerate(gstarts):
            packed = gfill(packed, jax.random.PRNGKey(i), start)
        print(f"group-16 lines [{n_groups}, {line_bytes}] = "
              f"{n_groups * line_bytes / 2**30:.2f} GiB physical", flush=True)
    else:
        # exact-size buffer (slicing afterwards would COPY it); the last
        # chunk overlap-fills the tail
        packed = jnp.zeros((n, row_bytes), jnp.uint8)
        starts = list(range(0, n - chunk, chunk)) + [max(0, n - chunk)]
        for i, start in enumerate(starts):
            packed = fill(packed, jax.random.PRNGKey(i), start)
    print(f"materialized on device in {time.perf_counter()-t0:.1f}s",
          flush=True)

    # dense params from a tiny init (the tables above are the real state)
    small = DLRMConfig(
        embedding_dim=128, table_sizes=(8,) * 26, mlp_bot=cfg.mlp_bot,
        mlp_top=cfg.mlp_top, interaction="dot", loss="bce",
        num_indices_per_lookup=1, compute_dtype="bfloat16",
    )
    params = DLRMModel(small).init_params(jax.random.PRNGKey(0))
    params["emb"] = {
        "quantized": {("packed_g16" if full else "packed"): packed}
    }
    row_offsets = jnp.asarray(model.row_offsets)

    # tables grouped by hot size: each group gathers its REAL hits only
    # (ragged-aware, the grouped_embedding_bag pattern); trivially one
    # group of hot=1 in the default mode
    groups = {}
    for t, h in enumerate(hots):
        groups.setdefault(int(h), []).append(t)
    if full:
        from dlrm_tpu.ops.quantized import quantized_embedding_bag_group16

        def bag(lines, flat, h):
            return quantized_embedding_bag_group16(lines, flat, None, 128, 4)
    else:
        from dlrm_tpu.ops.quantized import quantized_embedding_bag

        def bag(packed, flat, h):
            return quantized_embedding_bag(
                {"packed": packed}, flat, None, bits=4
            )

    def forward(p, bidx, dense):
        store = p["emb"]["quantized"][
            "packed_g16" if full else "packed"
        ]
        parts, order = [], []
        for h, tabs in sorted(groups.items()):
            sel = jnp.asarray(tabs, jnp.int32)
            g_idx = jnp.take(bidx, sel, axis=0)[:, :, :h]
            flat = g_idx + jnp.take(row_offsets, sel)[:, None, None]
            parts.append(bag(store, flat, h))  # [Tg, B, d]
            order += tabs
        pooled = jnp.concatenate(parts, axis=0)
        inv = np.zeros(len(order), np.int32)
        inv[np.asarray(order)] = np.arange(len(order))
        pooled = jnp.take(pooled, jnp.asarray(inv), axis=0)
        dp = {k: v for k, v in p.items() if k != "emb"}
        probs, _ = model.forward_from_pooled(
            dp, dense, jnp.transpose(pooled, (1, 0, 2))
        )
        return probs

    rng = np.random.default_rng(0)
    idx = np.stack(
        [rng.integers(0, int(t), (BS, hmax)) for t in cfg.table_sizes]
    ).astype(np.int32)
    batch = Batch(
        dense=jnp.asarray(
            rng.normal(size=(BS, 13)).astype(np.float32)
        ),
        idx=jnp.asarray(idx),
        wt=None,
        labels=None,
    )

    @jax.jit
    def many(p, b):
        # BOTH inputs rotate through the carry: anything loop-invariant
        # (e.g. the bottom MLP on a fixed dense) gets LICM-hoisted out of
        # the timed loop
        def one(carry, _):
            acc, bidx, bdense = carry
            probs = forward(p, bidx, bdense)
            return (
                acc + jnp.sum(probs),
                jnp.roll(bidx, 1, axis=1),
                jnp.roll(bdense, 1, axis=0),
            ), None

        (s, _, _), _ = jax.lax.scan(
            one, (jnp.float32(0), b.idx, b.dense), None, length=ITERS
        )
        return s

    t0 = time.perf_counter()
    s = float(many(params, batch))
    print(f"compile+first {time.perf_counter()-t0:.1f}s sum={s:.1f}",
          flush=True)
    assert np.isfinite(s)
    t0 = time.perf_counter()
    float(many(params, batch))
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"{'FULL-flagship' if full else 'terabyte'} int4 serving "
        f"({n} rows on ONE chip, bs {BS}, "
        f"{'REAL ragged multi-hot' if multihot else '1-hot'}): "
        f"{dt*1e3:.2f} ms/batch, {BS/dt:.0f} examples/s/chip", flush=True,
    )


if __name__ == "__main__":
    main()
