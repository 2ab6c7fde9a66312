"""The DLRM model as pure functions over a parameter pytree.

Capability parity with the reference DLRM_Net (dlrm_s_pytorch.py:207-730) and the
torchrec variants DLRM / DLRM_DCN / DLRM_Projection (torchrec_dlrm/dlrm_main.py:
598-635): dense features -> bottom MLP; sparse multi-hot indices -> sum-pooled
embedding lookups (plain / QR / MD-projected, optional weighted pooling); feature
interaction {dot, cat, dcn, projection}; top MLP ending in sigmoid -> click
probability; BCE/MSE/WBCE loss.

TPU-first design decisions (not a port):
  * params are a plain pytree; the model object only holds static config,
    so every method composes with jit/grad/shard_map.
  * all plain equal-width tables live in ONE stacked [sum_rows, dim] array ->
    a single fused gather per step instead of a per-table op loop.
  * sparse inputs are padded dense [T, B, H] (see dlrm_tpu/data/batch.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.batch import Batch
from dlrm_tpu.ops.embedding import (
    embedding_bag,
    fused_embedding_bag,
    qr_embedding_bag,
)
from dlrm_tpu.ops.interaction import (
    cat_interaction,
    dot_interaction,
    low_rank_cross_net,
    projection_interaction,
)
from dlrm_tpu.ops.mlp import apply_mlp, init_mlp, init_mlp_numpy

Params = Dict


def _xavier_uniform(rng, shape):
    fan_in, fan_out = shape[0], shape[1]
    a = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, jnp.float32, -a, a)


class DLRMModel:
    """Static-config holder; all state lives in the params pytree."""

    def __init__(self, cfg: DLRMConfig):
        self.cfg = cfg
        # The fused stacked-table fast path needs plain tables of uniform width.
        self.fused = cfg.qr is None and cfg.md is None
        if self.fused:
            sizes = np.asarray(cfg.table_sizes, dtype=np.int64)
            self.row_offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(
                np.int32
            )
            self.total_rows = int(sizes.sum())
        self.md_dims = cfg.md_dims
        # actual per-table dims: the MD solver dim applies only to tables above
        # the threshold; smaller tables keep the base dim
        # (_m = m[i] if n > md_threshold else base, dlrm_s_pytorch.py:267-269)
        self.table_dims = tuple(
            self.md_dims[i] if self._table_is_md(i, n) else cfg.embedding_dim
            for i, n in enumerate(cfg.table_sizes)
        )

    # ------------------------------------------------------------------ init

    def _table_is_qr(self, n: int) -> bool:
        return self.cfg.qr is not None and n > self.cfg.qr.threshold

    def _table_is_md(self, i: int, n: int) -> bool:
        return self.cfg.md is not None and n > self.cfg.md.threshold

    def init_params(self, rng: jax.Array) -> Params:
        """JAX-PRNG init with the reference's distributions: tables
        U(-sqrt(1/n), sqrt(1/n)) (dlrm_s_pytorch.py:280-282), MLP weights
        N(0, sqrt(2/(m+n))), biases N(0, sqrt(1/m)) (:221-225)."""
        cfg = self.cfg
        rng, r_emb, r_bot, r_top, r_int = jax.random.split(rng, 5)
        params: Params = {}
        if self.fused:
            keys = jax.random.split(r_emb, cfg.num_tables)
            tables = [
                jax.random.uniform(
                    keys[i],
                    (n, cfg.embedding_dim),
                    jnp.float32,
                    -np.sqrt(1.0 / n),
                    np.sqrt(1.0 / n),
                )
                for i, n in enumerate(cfg.table_sizes)
            ]
            params["emb"] = {"stacked": jnp.concatenate(tables, axis=0)}
        else:
            keys = jax.random.split(r_emb, cfg.num_tables)
            entries = []
            base = cfg.embedding_dim
            for i, n in enumerate(cfg.table_sizes):
                k = keys[i]
                if self._table_is_qr(n):
                    c = cfg.qr.collisions
                    nq = (n + c - 1) // c
                    m = base // 2 if cfg.qr.operation == "concat" else base
                    kq, kr = jax.random.split(k)
                    bound = np.sqrt(1.0 / n)
                    entries.append(
                        {
                            "q": jax.random.uniform(
                                kq, (nq, m), jnp.float32, -bound, bound
                            ),
                            "r": jax.random.uniform(
                                kr, (c, m), jnp.float32, -bound, bound
                            ),
                        }
                    )
                elif self._table_is_md(i, n):
                    dim = self.table_dims[i]
                    kw, kp = jax.random.split(k)
                    bound = np.sqrt(1.0 / n)
                    entry = {
                        "w": jax.random.uniform(
                            kw, (n, dim), jnp.float32, -bound, bound
                        )
                    }
                    if dim < base:
                        entry["proj"] = _xavier_uniform(kp, (dim, base))
                    entries.append(entry)
                else:
                    dim = base
                    bound = np.sqrt(1.0 / n)
                    entries.append(
                        {
                            "w": jax.random.uniform(
                                k, (n, dim), jnp.float32, -bound, bound
                            )
                        }
                    )
            params["emb"] = {"tables": entries}
        if cfg.weighted_pooling is not None:
            if self.fused:
                params["v_w"] = jnp.ones((self.total_rows,), jnp.float32)
            else:
                params["v_w"] = [
                    jnp.ones((n,), jnp.float32) for n in cfg.table_sizes
                ]
        params["bot"] = init_mlp(r_bot, cfg.mlp_bot)
        params["top"] = init_mlp(r_top, cfg.ln_top)
        params.update(self._init_interaction(r_int))
        return params

    def init_params_numpy(self) -> Params:
        """Reference-parity init: consumes the GLOBAL np.random stream in the
        exact order of DLRM_Net.__init__ (tables first at dlrm_s_pytorch.py:369,
        then bottom MLP :376, then top MLP :377). Caller seeds np.random.
        Restricted to plain tables (QR tables use the torch RNG in the
        reference, so there is no numpy sequence to match)."""
        cfg = self.cfg
        if cfg.qr is not None:
            raise NotImplementedError("numpy-parity init does not cover QR tables")
        tables = []
        for i, n in enumerate(cfg.table_sizes):
            dim = self.table_dims[i]
            w = np.random.uniform(
                low=-np.sqrt(1.0 / n), high=np.sqrt(1.0 / n), size=(n, dim)
            ).astype(np.float32)
            tables.append(w)
        params: Params = {}
        if self.fused:
            params["emb"] = {"stacked": jnp.asarray(np.concatenate(tables, axis=0))}
        else:
            # projections draw from a PRIVATE stream derived from (but not
            # consuming) the global state: the reference inits them with the
            # TORCH RNG, so numpy-stream parity for tables/MLPs must not be
            # disturbed by interleaved proj draws
            private = np.random.RandomState(
                int(np.random.get_state()[1][0]) ^ 0x9E3779B9
            )
            entries = []
            for i, (n, w) in enumerate(zip(cfg.table_sizes, tables)):
                entry = {"w": jnp.asarray(w)}
                if self._table_is_md(i, n) and self.md_dims[i] < cfg.embedding_dim:
                    a = np.sqrt(6.0 / (self.md_dims[i] + cfg.embedding_dim))
                    entry["proj"] = jnp.asarray(
                        private.uniform(
                            -a, a, size=(self.md_dims[i], cfg.embedding_dim)
                        ).astype(np.float32)
                    )
                entries.append(entry)
            params["emb"] = {"tables": entries}
        if cfg.weighted_pooling is not None:
            if self.fused:
                params["v_w"] = jnp.ones((self.total_rows,), jnp.float32)
            else:
                params["v_w"] = [jnp.ones((n,), jnp.float32) for n in cfg.table_sizes]
        params["bot"] = init_mlp_numpy(cfg.mlp_bot)
        params["top"] = init_mlp_numpy(cfg.ln_top)
        # interaction params are torch-RNG-initialized in the reference (not
        # numpy-parity material) but must still VARY with the user's seed:
        # derive a key from the global state without consuming it
        seed_key = int(np.random.get_state()[1][0]) & 0x7FFFFFFF
        params.update(self._init_interaction(jax.random.PRNGKey(seed_key)))
        return params

    def _init_interaction(self, rng: jax.Array) -> Params:
        cfg = self.cfg
        out: Params = {}
        if cfg.interaction == "dcn":
            n = cfg.num_features * cfg.mlp_bot[-1]
            r = cfg.dcn.low_rank_dim
            layers = []
            keys = jax.random.split(rng, cfg.dcn.num_layers)
            for k in keys:
                kv, kw = jax.random.split(k)
                layers.append(
                    {
                        "v": _xavier_uniform(kv, (r, n)),
                        "w": _xavier_uniform(kw, (n, r)),
                        "b": jnp.zeros((n,), jnp.float32),
                    }
                )
            out["dcn"] = layers
        elif cfg.interaction == "projection":
            d = cfg.mlp_bot[-1]
            fd = cfg.num_features * d
            p = cfg.proj_interaction_dims[-1]
            k1, k2 = jax.random.split(rng)
            out["proj_w1"] = _xavier_uniform(k1, (fd, p * d))
            out["proj_w2"] = _xavier_uniform(k2, (fd, p * d))
        return out

    # --------------------------------------------------------- quantization

    def quantize_mlps(self, params: Params, bits: int) -> Params:
        """Dynamic-quantized inference MLPs (the reference's
        torch.quantization.quantize_dynamic to qint8/float16 on every Linear,
        dlrm_s_pytorch.py:1473-1480): bits=8 -> per-channel int8 weights with
        per-batch activation quantization on the MXU's int8 path; bits=16 ->
        bfloat16 weights (the TPU float16 analog)."""
        from dlrm_tpu.ops.quantized import quantize_mlp

        out = dict(params)
        out["bot"] = quantize_mlp(params["bot"], bits)
        out["top"] = quantize_mlp(params["top"], bits)
        return out

    def quantize_embeddings(
        self, params: Params, bits: int, group16: bool = False
    ) -> Params:
        """Post-training row-wise quantization for inference
        (quantize_embedding, dlrm_s_pytorch.py:465-481): replaces the fp32
        tables with int8/int4 prepacked rows (inline per-row scale/bias);
        the fp32 tables are dropped (like the reference sets emb_l = None).
        group16=True additionally packs 16 rows per tile line (zero u8-tile
        waste — 1.78x more table capacity per chip for int4; see
        ops/quantized.py), fused-stacked tables only."""
        from dlrm_tpu.ops.quantized import pack_group16, quantize_table

        out = dict(params)
        if self.fused:
            q = quantize_table(np.asarray(params["emb"]["stacked"]), bits)
            if group16:
                q = {"packed_g16": pack_group16(q["packed"])}
            out["emb"] = {"quantized": jax.tree_util.tree_map(jnp.asarray, q)}
        else:
            if group16:
                raise NotImplementedError(
                    "group16 quantized packing requires the fused stacked "
                    "layout (plain uniform-width tables)"
                )
            entries = []
            for entry in params["emb"]["tables"]:
                if "w" not in entry:
                    raise NotImplementedError(
                        "quantized inference supports plain/MD tables only "
                        "(reference: 4/8-bit is mutually exclusive with QR, "
                        "dlrm_s_pytorch.py:1042-1057)"
                    )
                q = {
                    "quantized": jax.tree_util.tree_map(
                        jnp.asarray,
                        quantize_table(np.asarray(entry["w"]), bits),
                    )
                }
                if "proj" in entry:
                    q["proj"] = entry["proj"]
                entries.append(q)
            out["emb"] = {"tables": entries}
        return out

    # --------------------------------------------------------------- forward

    def pooling_weights(self, params: Params):
        """v_w, frozen under '--weighted-pooling fixed': the reference
        registers fixed pooling weights as non-trainable BUFFERS vs learned
        Parameters (dlrm_s_pytorch.py:337-340); here stop_gradient zeroes
        their grads, so every optimizer's update is an exact no-op and the
        weights stay at init."""
        vw = params["v_w"]
        if self.cfg.weighted_pooling == "fixed":
            vw = jax.tree_util.tree_map(jax.lax.stop_gradient, vw)
        return vw

    def apply_emb(self, params: Params, batch: Batch) -> jax.Array:
        """Pooled embeddings [B, T, dim] (apply_emb, dlrm_s_pytorch.py:407-462)."""
        from dlrm_tpu.ops.quantized import infer_bits, quantized_embedding_bag

        cfg = self.cfg
        idx, wt = batch.idx, batch.wt
        if self.fused and "quantized" in params.get("emb", {}):
            qt = params["emb"]["quantized"]
            flat_idx = idx + jnp.asarray(self.row_offsets)[:, None, None]
            if "v_w" in params:
                vw = jnp.take(self.pooling_weights(params), flat_idx, axis=0)
                wt = vw if wt is None else wt * vw
            if "packed_g16" in qt:
                from dlrm_tpu.ops.quantized import (
                    quantized_embedding_bag_group16,
                )

                d = cfg.embedding_dim
                pooled = quantized_embedding_bag_group16(
                    qt["packed_g16"], flat_idx, wt, d, infer_bits(qt, d)
                )
            else:
                pooled = quantized_embedding_bag(
                    qt, flat_idx, wt, bits=infer_bits(qt, cfg.embedding_dim)
                )  # [T, B, d]
            return jnp.transpose(pooled, (1, 0, 2))
        if self.fused:
            if "v_w" in params:
                flat_idx = idx + jnp.asarray(self.row_offsets)[:, None, None]
                vw = jnp.take(
                    self.pooling_weights(params), flat_idx, axis=0
                )  # [T, B, H]
                wt = vw if wt is None else wt * vw
            return fused_embedding_bag(
                params["emb"]["stacked"], jnp.asarray(self.row_offsets), idx, wt
            )
        pooled = []
        for k, entry in enumerate(params["emb"]["tables"]):
            idx_k = idx[k]
            wt_k = None if wt is None else wt[k]
            if "v_w" in params:
                vw = jnp.take(self.pooling_weights(params)[k], idx_k, axis=0)
                wt_k = vw if wt_k is None else wt_k * vw
            if "quantized" in entry:
                v = quantized_embedding_bag(
                    entry["quantized"],
                    idx_k,
                    wt_k,
                    bits=infer_bits(entry["quantized"], self.table_dims[k]),
                )
                if "proj" in entry:
                    v = jnp.dot(v, entry["proj"], preferred_element_type=jnp.float32)
            elif "q" in entry:
                v = qr_embedding_bag(
                    entry["q"],
                    entry["r"],
                    cfg.qr.collisions,
                    cfg.qr.operation,
                    idx_k,
                    wt_k,
                )
            else:
                v = embedding_bag(entry["w"], idx_k, wt_k)
                if "proj" in entry:
                    v = jnp.dot(
                        v, entry["proj"], preferred_element_type=jnp.float32
                    )
            pooled.append(v)
        return jnp.stack(pooled, axis=1)  # [B, T, dim]

    def interact(self, params: Params, x: jax.Array, ly: jax.Array) -> jax.Array:
        cfg = self.cfg
        if cfg.interaction == "dot":
            return dot_interaction(x, ly, cfg.interaction_itself)
        if cfg.interaction == "cat":
            return cat_interaction(x, ly)
        if cfg.interaction == "dcn":
            x0 = cat_interaction(x, ly)
            return low_rank_cross_net(params["dcn"], x0)
        if cfg.interaction == "projection":
            return projection_interaction(
                x, ly, params["proj_w1"], params["proj_w2"]
            )
        raise AssertionError(cfg.interaction)

    def logits_from_interaction(self, params: Params, z: jax.Array) -> jax.Array:
        """Top MLP on an already-computed interaction output -> fp32 logits.
        The sigmoid sits on the last top layer (sigmoid_top = len-2,
        dlrm_s_pytorch.py:1293), so all but the last layer run with the
        activation disabled and the last layer stays linear. Shared by
        forward_from_pooled and tools/visualize.py's representation dump
        (which keeps z around), covering quantized checkpoints in both."""
        quantized = bool(params["top"]) and "qw" in params["top"][0]
        if quantized:
            from dlrm_tpu.ops.quantized import (
                apply_mlp_quantized,
                quantized_linear,
            )

            hidden = apply_mlp_quantized(params["top"][:-1], z, sigmoid_layer=-1)
            return quantized_linear(params["top"][-1], hidden).astype(jnp.float32)
        hidden = apply_mlp(params["top"][:-1], z, sigmoid_layer=-1)
        last = params["top"][-1]
        return (
            jnp.dot(
                hidden, last["w"].astype(hidden.dtype),
                preferred_element_type=jnp.float32,
            )
            + last["b"]
        ).astype(jnp.float32)

    def forward_from_pooled(self, params: Params, dense: jax.Array, ly: jax.Array):
        """Dense tower + interaction + top MLP given pooled embeddings
        [B, T, d] -> (probability, logits). Split out so the fused-sparse
        train step (dlrm_tpu/train/fused_step.py) can differentiate w.r.t.
        the pooled activations instead of the table."""
        from dlrm_tpu.utils import profiling as prof

        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        quantized = bool(params["bot"]) and "qw" in params["bot"][0]
        if quantized:
            from dlrm_tpu.ops.quantized import apply_mlp_quantized

            mlp = apply_mlp_quantized
        else:
            mlp = apply_mlp
        with prof.scope(prof.BOT_FWD):
            x = mlp(params["bot"], dense.astype(dtype), cfg.sigmoid_bot)
        with prof.scope(prof.INT_FWD):
            z = self.interact(params, x, ly.astype(x.dtype))
        with prof.scope(prof.TOP_FWD):
            logits = self.logits_from_interaction(params, z)
        p = jax.nn.sigmoid(logits)
        if 0.0 < cfg.loss_threshold < 1.0:
            p = jnp.clip(p, cfg.loss_threshold, 1.0 - cfg.loss_threshold)
        return p, logits

    def apply_with_logits(self, params: Params, batch: Batch):
        """Full forward pass -> (click probability [B, 1], pre-sigmoid logits)
        (sequential_forward, dlrm_s_pytorch.py:587-612). The logits feed the
        numerically-stable BCE (sigmoid saturates to exactly 1.0 in fp32/bf16
        after large top-MLP steps; torch's BCELoss survives by clamping logs
        at -100, we do it the clean way from logits)."""
        from dlrm_tpu.utils import profiling as prof

        with prof.scope(prof.EMB_FWD):
            ly = self.apply_emb(params, batch)
        return self.forward_from_pooled(params, batch.dense, ly)

    def apply(self, params: Params, batch: Batch) -> jax.Array:
        return self.apply_with_logits(params, batch)[0]

    # ------------------------------------------------------------------ loss

    def loss(self, params: Params, batch: Batch) -> jax.Array:
        p, logits = self.apply_with_logits(params, batch)
        return compute_loss(self.cfg, p, batch.labels, logits=logits)

    def loss_and_prob(self, params: Params, batch: Batch):
        p, logits = self.apply_with_logits(params, batch)
        return compute_loss(self.cfg, p, batch.labels, logits=logits), p


def per_example_loss(
    cfg: DLRMConfig,
    probs: jax.Array,
    labels: jax.Array,
    logits: Optional[jax.Array] = None,
) -> jax.Array:
    """MSE / BCE / weighted-BCE per example (dlrm_s_pytorch.py:384-397,
    loss_fn_wrap :148-156). BCE is computed from logits when available:
    -log sigmoid(z) = softplus(-z), so per = softplus(z) - t*z — exact and
    finite for any z. With loss_threshold clamping active the reference
    semantics (clamped probabilities) are used instead."""
    t = labels.astype(jnp.float32)
    if cfg.loss == "mse":
        return jnp.square(probs - t)
    if logits is not None and not (0.0 < cfg.loss_threshold < 1.0):
        z = logits.astype(jnp.float32)
        per = jax.nn.softplus(z) - t * z
    else:
        eps = 1e-7  # >= fp32 ulp at 1.0 so the clip actually bites
        p = jnp.clip(probs, eps, 1.0 - eps)
        per = -(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))
    if cfg.loss == "bce":
        return per
    # wbce: per-sample weight selected by the integer target
    # (loss_ws[T.long()], dlrm_s_pytorch.py:153-156)
    ws = jnp.where(
        t >= 0.5,
        jnp.float32(cfg.loss_weights[1]),
        jnp.float32(cfg.loss_weights[0]),
    )
    return ws * per


def masked_mean(
    per: jax.Array,
    labels: jax.Array,
    denom: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean over REAL rows only. The bin loader pads the last batch to the
    static batch size with label=-1 / weight-0 rows (criteo.py pad_last —
    the reference never pads, its last torch batch is simply short); a
    plain mean would fold softplus(z) - t*z of fabricated rows into the
    loss AND its gradients. `denom` overrides the valid count for
    distributed callers that psum it across shards."""
    t = labels.astype(jnp.float32).reshape(per.shape)
    valid = (t >= 0.0).astype(jnp.float32)
    if denom is None:
        denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(per * valid) / denom


def valid_count(labels: jax.Array) -> jax.Array:
    """Number of real (non-pad) rows in a labels array."""
    return jnp.sum((labels.astype(jnp.float32) >= 0.0).astype(jnp.float32))


def compute_loss(
    cfg: DLRMConfig,
    probs: jax.Array,
    labels: jax.Array,
    logits: Optional[jax.Array] = None,
) -> jax.Array:
    return masked_mean(per_example_loss(cfg, probs, labels, logits), labels)
