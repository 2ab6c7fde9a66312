"""1-step on-chip rwsadagrad comparison + error growth across steps."""
import numpy as np
import jax, jax.numpy as jnp
from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train.fused_step import make_fused_train_step
from dlrm_tpu.train.stream_step import (
    init_stream_opt_state, make_stream_train_step, pad_params, plan_for_model,
)

cfg = DLRMConfig(
    embedding_dim=128, table_sizes=(4096, 2048, 3000), mlp_bot=(13, 32, 128),
    mlp_top=(64, 8, 1), interaction="dot", loss="bce",
    num_indices_per_lookup=4,
)
model = DLRMModel(cfg)
params = model.init_params(jax.random.PRNGKey(0))
B = 256
rng = np.random.default_rng(0)
hb = fixed_multihot_batch(rng, cfg.num_dense, cfg.table_sizes, B, 4)
opt = "rwsadagrad"

fs = make_fused_train_step(model, opt)
p1 = jax.tree_util.tree_map(jnp.copy, params)
s1 = init_opt_state(opt, p1)
plan = plan_for_model(model, B, block_rows=1024)
sp = pad_params(jax.tree_util.tree_map(jnp.copy, params), model, plan)
ss = init_stream_opt_state(opt, sp, plan)
st = make_stream_train_step(model, opt, plan, fwd_impl="gather",
                            grad_impl="gather", mm_dtype=jnp.float32)
b2 = hb.with_stream_work(plan).to_device()
bd = hb.to_device()
offs = np.concatenate([[0], np.cumsum(cfg.table_sizes)[:-1]])
p2, s2 = sp, ss
for step_i in range(3):
    p1, s1, l1, _ = fs(p1, s1, bd, 0.05)
    p2, s2, l2, _ = st(p2, s2, b2, 0.05)
    ref = np.asarray(jax.device_get(p1["emb"]["stacked"]))
    got = np.asarray(jax.device_get(p2["emb"]["stacked"]))
    errs = []
    for t, n in enumerate(cfg.table_sizes):
        a = ref[offs[t]:offs[t]+n]
        b = got[plan.padded_offsets[t]:plan.padded_offsets[t]+n]
        errs.append(np.abs(a-b).max())
    print(f"step {step_i+1}: loss {float(l1):.6f}/{float(l2):.6f} "
          f"max errs {['%.2e'%e for e in errs]}", flush=True)
