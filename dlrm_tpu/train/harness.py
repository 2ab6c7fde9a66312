"""Training harness: the run()/inference() equivalent.

Capability parity with the reference training loop (dlrm_s_pytorch.py:1516-1781)
and inference() (:759-899): epoch/batch loop with ms/it + loss printing, periodic
eval with accuracy / mlperf metric suite, checkpoint-on-best, resume with data
fast-forward (:1429-1437, 1535-1546), LR policy stepping, early stop on
accuracy/AUC thresholds (:1730-1760), gradient accumulation, debug-mode
parameter dumps, and mlperf event logging.

TPU-shaped differences: batches are prefetched host->device one step ahead
(double buffering) so input transfer overlaps the jitted step; timing uses the
async-dispatch pipeline and syncs only at print boundaries.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from dlrm_tpu.config import DLRMConfig, TrainConfig
from dlrm_tpu.data.batch import Batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.ops import metrics as M
from dlrm_tpu.optim.lr_policy import LRPolicy
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train import checkpoint as ckpt
from dlrm_tpu.train.step import make_eval_step, make_train_step
from dlrm_tpu.utils import logging as obs


def _skip_batches(src, skip: int):
    """First `skip` batches of one epoch pass, without materializing them:
    loaders that enumerate indices (CriteoBinFile) skip at the index
    level (zero disk reads); anything else is islice'd (host batches are
    built but never H2D-transferred). A prefetcher wrapper (--num-workers)
    is unwrapped so the index-level skip still reaches the loader, then
    re-applied around the skipped iterable (one-shot: resume skips only
    the first pass of the resumed epoch)."""
    from dlrm_tpu.train.pipeline import DevicePrefetcher

    if isinstance(src, DevicePrefetcher):
        import copy

        clone = copy.copy(src)
        clone.loader = _skip_batches(src.loader, skip)
        return clone
    if hasattr(src, "batch_indices") and hasattr(src, "read_batch"):
        ids = list(src.batch_indices())[skip:]
        return (src.read_batch(i) for i in ids)
    import itertools

    return itertools.islice(iter(src), skip, None)


class _group_batches:
    """Stack groups of `k` consecutive HostBatches on a new leading axis
    (short trailing groups are dropped, like the reference's incomplete
    accumulation window)."""

    def __init__(self, loader, k: int):
        self.loader = loader
        self.k = k

    def __len__(self):
        return len(self.loader) // self.k

    def __iter__(self):
        from dlrm_tpu.data.random_data import HostBatch

        group: List[Any] = []
        for hb in self.loader:
            group.append(hb)
            if len(group) == self.k:
                yield HostBatch(
                    dense=np.stack([b.dense for b in group]),
                    idx=np.stack([b.idx for b in group]),
                    wt=(
                        None
                        if group[0].wt is None
                        else np.stack([b.wt for b in group])
                    ),
                    labels=np.stack([b.labels for b in group]),
                )
                group = []


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: int = 0
    iteration: int = 0  # within-epoch batch index
    total_iter: int = 0
    best_acc: float = 0.0
    best_auc: float = 0.0


class Trainer:
    """Single-host trainer; the sharded variant wraps the same loop with a
    ButterflyDLRM step (dlrm_tpu/parallel/butterfly.py)."""

    def __init__(
        self,
        model: DLRMModel,
        train_cfg: TrainConfig,
        train_data: Iterable,
        test_data: Optional[Iterable] = None,
        scalar_log: Optional[obs.ScalarLogger] = None,
        mlperf: Optional[obs.MLPerfLogger] = None,
        train_step=None,
        eval_step=None,
        to_device: Optional[Callable] = None,
    ):
        self.model = model
        self.cfg = model.cfg
        self.tc = train_cfg
        self.train_data = train_data
        self.test_data = test_data
        self.scalar_log = scalar_log or obs.ScalarLogger(None)
        self.mlperf = mlperf or obs.MLPerfLogger(enabled=train_cfg.mlperf_logging)
        if train_step is None:
            from dlrm_tpu.train.fused_step import (
                make_fused_train_step,
                supports_fused,
            )

            # fused sparse in-backward update when the config allows it
            # (O(touched rows) table traffic); plain AD otherwise
            fused_ok = supports_fused(model) and train_cfg.optimizer in (
                "sgd", "adagrad", "rwsadagrad",
            )
            if train_cfg.grad_accum_iter > 1:
                if fused_ok:
                    from dlrm_tpu.train.fused_step import (
                        make_fused_grad_accum_train_step,
                    )

                    train_step = make_fused_grad_accum_train_step(
                        model, train_cfg.optimizer,
                        train_cfg.grad_accum_iter, eps=train_cfg.eps,
                    )
                else:
                    from dlrm_tpu.train.step import (
                        make_grad_accum_train_step,
                    )

                    train_step = make_grad_accum_train_step(
                        model, train_cfg.optimizer,
                        train_cfg.grad_accum_iter, eps=train_cfg.eps,
                    )
            elif fused_ok:
                train_step = make_fused_train_step(
                    model, train_cfg.optimizer, eps=train_cfg.eps
                )
            else:
                train_step = make_train_step(
                    model, train_cfg.optimizer, eps=train_cfg.eps
                )
        self.train_step = train_step
        self.eval_step = eval_step or make_eval_step(model)
        self.to_device = to_device or (lambda hb: hb.to_device())
        self._run_stop_emitted = False
        self.lr_policy = LRPolicy(
            train_cfg.learning_rate,
            train_cfg.lr_num_warmup_steps,
            train_cfg.lr_decay_start_step,
            train_cfg.lr_num_decay_steps,
        )

    # ------------------------------------------------------------------ init

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        tc = self.tc
        if tc.debug_mode or tc.numpy_rand_seed is not None:
            np.random.seed(tc.numpy_rand_seed)
            try:
                params = self.model.init_params_numpy()
            except NotImplementedError:
                # QR tables: the reference inits them from the TORCH RNG
                # (tricks/qr_embedding_bag.py:189-190), so there is no
                # numpy sequence to match — fall back to the JAX init
                # seeded by the same flag
                params = self.model.init_params(
                    jax.random.PRNGKey(tc.numpy_rand_seed)
                )
        else:
            params = self.model.init_params(
                jax.random.PRNGKey(
                    tc.numpy_rand_seed if seed is None else seed
                )
            )
        opt_state = init_opt_state(tc.optimizer, params)
        state = TrainState(params=params, opt_state=opt_state)
        if tc.load_model:
            params, opt_state, meta = ckpt.load_checkpoint(
                tc.load_model, params, opt_state
            )
            state = TrainState(
                params=params,
                opt_state=opt_state,
                epoch=int(meta.get("epoch", 0)),
                iteration=int(meta.get("iteration", 0)),
                total_iter=int(meta.get("total_iter", 0)),
                best_acc=float(meta.get("best_acc", 0.0)),
                best_auc=float(meta.get("best_auc", 0.0)),
            )
            self.lr_policy.load_state_dict(
                meta.get("lr_policy", self.lr_policy.state_dict())
            )
            print(
                f"Loaded model from {tc.load_model}: epoch {state.epoch} "
                f"iteration {state.iteration}"
            )
        return state

    # ------------------------------------------------------------------ train

    def train(self, state: Optional[TrainState] = None) -> TrainState:
        tc = self.tc
        state = state or self.init_state()
        if tc.inference_only:
            # the reference's inference-only run prints the accuracy line
            # via inference() (dlrm_s_pytorch.py:873-898, invoked at :1458)
            results = self.evaluate(state)
            acc = results.get("accuracy", 0.0)
            line = (
                f"Testing at - {state.total_iter}/{state.total_iter} of "
                f"epoch {state.epoch}, accuracy {acc * 100:.3f} %"
            )
            if tc.mlperf_logging and "roc_auc" in results:
                line += f", auc {results['roc_auc']:.6f}"
            print(line)
            return state
        # the INIT block opened by the CLI (CACHE_CLEAR + INIT_START,
        # dlrm_s_pytorch.py:1036-1040) closes when training begins; then the
        # submission + hyperparameter block (:1097-1102, 1389-1396, 1487-1507)
        self.mlperf.end(obs.INIT_STOP)
        self.mlperf.start(obs.RUN_START)
        self.mlperf.submission("dlrm")
        self.mlperf.event(obs.SEED, value=tc.numpy_rand_seed)
        self.mlperf.event(obs.GLOBAL_BATCH_SIZE, value=tc.mini_batch_size)
        # LR logged twice, mirroring the reference's compliance-checker
        # workaround (dlrm_s_pytorch.py:1389-1407)
        self.mlperf.event(obs.OPT_BASE_LR, value=tc.learning_rate)
        self.mlperf.event(
            obs.OPT_LR_WARMUP_STEPS, value=tc.lr_num_warmup_steps
        )
        self.mlperf.event(
            "sgd_opt_base_learning_rate", value=tc.learning_rate
        )
        self.mlperf.event(
            "lr_decay_start_steps", value=tc.lr_decay_start_step
        )
        self.mlperf.event(
            "sgd_opt_learning_rate_decay_steps", value=tc.lr_num_decay_steps
        )
        self.mlperf.event("sgd_opt_learning_rate_decay_poly_power", value=2)
        print("time/loss/accuracy (if enabled):")
        nbatches = len(self.train_data)
        skip_epoch, skip_iter = state.epoch, state.iteration
        stop = False
        self._run_stop_emitted = False
        for epoch in range(state.epoch, tc.nepochs):
            self.mlperf.start(
                obs.BLOCK_START,
                metadata={"first_epoch_num": epoch + 1, "epoch_count": 1},
            )
            self.mlperf.start(
                obs.EPOCH_START, metadata={"epoch_num": epoch + 1}
            )
            accum_losses, accum_time, accum_count = [], 0.0, 0
            # host-prep + H2D overlapped with the device step
            # (TrainPipelineSparseDist equivalent, dlrm_tpu/train/pipeline.py)
            from dlrm_tpu.train.pipeline import DevicePrefetcher

            train_src = self.train_data
            if hasattr(train_src, "set_epoch"):
                # keep the shuffle permutation tied to the TRAINER's epoch
                # (not the loader's restart count) so resume fast-forward
                # skips exactly the batches the pre-crash run trained
                train_src.set_epoch(epoch)
            if tc.grad_accum_iter > 1:
                # stack groups of accum_iter host batches on a leading axis
                # (dlrm_s_pytorch.py:1604-1621 skips zero_grad/step except
                # every Nth batch; here the scan inside the accum step
                # consumes the whole group at once)
                train_src = _group_batches(
                    self.train_data, tc.grad_accum_iter
                )
                nbatches = len(train_src)
            # checkpoint fast-forward (dlrm_s_pytorch.py:1535-1546): skip
            # UPSTREAM of the prefetcher so skipped batches are neither
            # H2D-transferred nor (when the loader can enumerate indices)
            # even read from disk
            skip = skip_iter if epoch == skip_epoch else 0
            if skip:
                train_src = _skip_batches(train_src, skip)
            prefetched = DevicePrefetcher(train_src, self.to_device)
            for it, batch in enumerate(prefetched, start=skip):
                t0 = time.perf_counter()
                lr = self.lr_policy.lr
                state.params, state.opt_state, loss, _ = self.train_step(
                    state.params, state.opt_state, batch, lr
                )
                self.lr_policy.step()
                state.iteration = it + 1
                state.total_iter += 1
                # keep the DEVICE loss array; float() would force a
                # host-device sync every step and serialize dispatch with
                # execution — convert only at print boundaries
                accum_losses.append(loss)
                accum_count += 1
                accum_time += (time.perf_counter() - t0) * 1000
                should_print = (
                    (it + 1) % tc.print_freq == 0 or it + 1 == nbatches
                )
                if should_print:
                    gl = float(sum(float(x) for x in accum_losses)) / (
                        accum_count
                    )
                    gt = accum_time / accum_count if tc.print_time else -1.0
                    wall = (
                        time.strftime(" (%H:%M)") if tc.print_wall_time else ""
                    )
                    print(
                        f"Finished training it {it + 1}/{nbatches} of epoch "
                        f"{epoch}, {gt:.2f} ms/it, loss {gl:.6f}{wall}"
                    )
                    self.scalar_log.add_scalar("Train/Loss", gl, state.total_iter)
                    accum_losses = []
                    accum_time = 0.0
                    accum_count = 0

                # periodic eval (dlrm_s_pytorch.py:1686-1715)
                if (
                    tc.test_freq > 0
                    and self.test_data is not None
                    and (it + 1) % tc.test_freq == 0
                ):
                    stop = self._eval_and_maybe_stop(state, epoch, it + 1, nbatches)
                    if stop:
                        break
            state.epoch = epoch + 1
            state.iteration = 0
            self.mlperf.end(obs.EPOCH_STOP, metadata={"epoch_num": epoch + 1})
            self.mlperf.end(
                obs.BLOCK_STOP, metadata={"first_epoch_num": epoch + 1}
            )
            if stop:
                break
        if tc.test_freq <= 0 and self.test_data is not None:
            # state.epoch was already advanced past the last epoch; pass the
            # 0-based epoch index so epoch_num matches the in-loop formula
            self._eval_and_maybe_stop(
                state, state.epoch - 1, state.total_iter, state.total_iter
            )
        # reference RUN_STOP semantics (dlrm_s_pytorch.py:1752-1781): SUCCESS
        # is emitted at the auc-threshold stop inside the loop; a run that
        # never clears the auc threshold ends ABORTED
        if not self._run_stop_emitted and state.best_auc <= tc.mlperf_auc_threshold:
            self.mlperf.end(obs.RUN_STOP, metadata={"status": "aborted"})
            self._run_stop_emitted = True
        return state

    # ------------------------------------------------------------------- eval

    def evaluate(self, state: TrainState,
                 epoch_num: Optional[float] = None) -> Dict[str, float]:
        """inference() equivalent (dlrm_s_pytorch.py:759-899)."""
        tc = self.tc
        from dlrm_tpu.train.pipeline import DevicePrefetcher

        meta = {} if epoch_num is None else {"epoch_num": epoch_num}
        self.mlperf.start(obs.EVAL_START, metadata=meta)
        import jax

        multiproc = jax.process_count() > 1
        if multiproc:
            # streaming histogram eval: each rank folds its ADDRESSABLE
            # shards into additive (pos, neg) bucket counts, summed across
            # processes — every mlperf metric (auc/acc/prec/recall/f1/ap)
            # derives from the histogram alone, so no rank ever hosts the
            # full 89M-row score set (torchmetrics AUROC sync role,
            # torchrec_dlrm/dlrm_main.py:337-366)
            hist = M.AucState.create()
            for batch in DevicePrefetcher(self.test_data, self.to_device):
                p = self.eval_step(state.params, batch)
                s, lbl = M.shards_scores_labels(p, batch.labels)
                hist = M.auc_update(hist, s, lbl)
            hist = M.allreduce_auc_state(hist)
            full = M.binary_metrics_from_hist(hist)
            results = (
                full
                if tc.mlperf_logging
                else {"accuracy": full["accuracy"]}
            )
        else:
            scores: List[np.ndarray] = []
            labels: List[np.ndarray] = []
            for batch in DevicePrefetcher(self.test_data, self.to_device):
                p = self.eval_step(state.params, batch)
                scores.append(np.asarray(p).ravel())
                lbl = np.asarray(batch.labels).ravel()
                labels.append(lbl)
            s = np.concatenate(scores)
            l = np.concatenate(labels)
            mask = l >= 0  # drop padded rows
            s, l = s[mask], l[mask]
            if tc.mlperf_logging:
                results = M.binary_metrics(s, l)
            else:
                # rounded-prediction accuracy (dlrm_s_pytorch.py:814-823)
                results = {"accuracy": float(np.mean(np.round(s) == l))}
        self.mlperf.end(obs.EVAL_STOP, metadata=meta)
        # MLPerf DLRM's eval metric IS the AUC (the reference gates RUN_STOP
        # on it, dlrm_s_pytorch.py:1745); fall back to plain accuracy when
        # AUC isn't computed (non-mlperf eval).
        self.mlperf.event(
            obs.EVAL_ACCURACY,
            value=results.get("roc_auc", results.get("accuracy")),
            metadata=meta,
        )
        return results

    def _eval_and_maybe_stop(self, state: TrainState, epoch: int, it: int,
                             nbatches: int = 0) -> bool:
        tc = self.tc
        # epoch_num_float, dlrm_s_pytorch.py:1675
        epoch_num = (it / nbatches if nbatches else 0.0) + epoch + 1
        results = self.evaluate(state, epoch_num=epoch_num)
        acc = results.get("accuracy", 0.0)
        auc = results.get("roc_auc", float("nan"))
        is_best = acc > state.best_acc
        if is_best:
            state.best_acc = acc
        if not np.isnan(auc) and auc > state.best_auc:
            state.best_auc = auc
        # "Testing at - j+1/nbatches of epoch k" (dlrm_s_pytorch.py:873-898)
        line = (
            f"Testing at - {it}/{nbatches} of epoch {epoch}, "
            f"accuracy {acc * 100:.3f} %, best {state.best_acc * 100:.3f} %"
        )
        if tc.mlperf_logging:
            line += f", auc {auc:.6f}, best auc {state.best_auc:.6f}"
        print(line)
        self.scalar_log.add_scalar("Test/Acc", acc, state.total_iter)
        if tc.mlperf_logging:
            for k, v in results.items():
                self.scalar_log.add_scalar(
                    f"mlperf-metrics-test/{k}", v, state.total_iter
                )
        if is_best and tc.save_model:
            self.save(state, tc.save_model)
        # early stop thresholds (dlrm_s_pytorch.py:1730-1760)
        if tc.mlperf_acc_threshold > 0 and state.best_acc > tc.mlperf_acc_threshold:
            print(f"MLPerf testing accuracy threshold {tc.mlperf_acc_threshold} reached, stop training")
            return True
        if (
            tc.mlperf_auc_threshold > 0
            and state.best_auc > tc.mlperf_auc_threshold
        ):
            print(f"MLPerf testing auc threshold {tc.mlperf_auc_threshold} reached, stop training")
            # reference emits RUN_STOP success at the threshold stop itself
            # (dlrm_s_pytorch.py:1752-1762)
            self.mlperf.end(obs.RUN_STOP, metadata={"status": "success"})
            self._run_stop_emitted = True
            return True
        return False

    # ------------------------------------------------------------- checkpoint

    def save(self, state: TrainState, path: str) -> None:
        ckpt.save_checkpoint(
            path,
            state.params,
            state.opt_state,
            meta={
                "epoch": state.epoch,
                "iteration": state.iteration,
                "total_iter": state.total_iter,
                "best_acc": state.best_acc,
                "best_auc": state.best_auc,
                "lr_policy": self.lr_policy.state_dict(),
            },
        )
        print(f"Saved model to {path}")


def dump_parameters(params, precision: int = 5) -> None:
    """Debug-mode parameter dump (dlrm_s_pytorch.py:1222-1274 prints all
    initial/updated params): tables then per-layer weights and biases."""
    np.set_printoptions(precision=precision)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        print(keys)
        print(np.asarray(leaf))
