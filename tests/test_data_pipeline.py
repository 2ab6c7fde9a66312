"""Criteo preprocessing + loaders, synthetic trace generator, multi-hot.

Mirrors the reference's loader-equivalence self-tests
(data_loader_terabyte.py:313-377 _test_bin) on tiny synthetic raw files.
"""

import os

import numpy as np
import pytest

from dlrm_tpu.data import criteo, multi_hot, synthetic
from dlrm_tpu.data.random_data import HostBatch


def _write_raw_day(path, n, rng, missing_rate=0.2):
    """Tiny Criteo-format tsv: label \\t 13 ints \\t 26 hex, some fields empty."""
    with open(path, "wb") as f:
        for _ in range(n):
            label = rng.integers(0, 2)
            dense = [
                b"" if rng.random() < missing_rate else str(rng.integers(-2, 1000)).encode()
                for _ in range(13)
            ]
            cats = [
                b"" if rng.random() < missing_rate else format(rng.integers(0, 1 << 32), "x").encode()
                for _ in range(26)
            ]
            f.write(str(label).encode() + b"\t" + b"\t".join(dense + cats) + b"\n")


@pytest.fixture
def raw_days(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for d in range(3):
        p = str(tmp_path / f"day_{d}")
        _write_raw_day(p, 40 + d * 7, rng)
        paths.append(p)
    return paths


def test_python_native_parser_equivalence(raw_days):
    from dlrm_tpu.native import criteo_native

    if not criteo_native.available():
        pytest.skip("native toolchain unavailable")
    for p in raw_days:
        ours = criteo.parse_raw_day.__wrapped__(p) if hasattr(
            criteo.parse_raw_day, "__wrapped__"
        ) else None
        # call the pure-python path directly by bypassing the native shortcut
        import dlrm_tpu.data.criteo as C

        nat = criteo_native.parse_raw_day(p, -1, 0.0, 123)
        # force the numpy fallback
        import unittest.mock as mock

        with mock.patch.object(criteo_native, "available", return_value=False):
            py = C.parse_raw_day(p, -1, 0.0, 123)
        np.testing.assert_array_equal(nat["y"], py["y"])
        np.testing.assert_array_equal(nat["X_int"], py["X_int"])
        np.testing.assert_array_equal(nat["X_cat"], py["X_cat"])


def test_hashing_and_counts(raw_days, tmp_path):
    art = criteo.preprocess_raw(
        raw_days, str(tmp_path / "out"), max_ind_range=1000, randomize="none"
    )
    assert art.counts.shape == (26,)
    total = 0
    for p in art.day_files:
        with np.load(p) as z:
            assert z["X_cat"].min() >= 0
            for c in range(26):
                assert z["X_cat"][:, c].max() < art.counts[c]
            total += z["y"].shape[0]
    assert total == 40 + 47 + 54


def test_bin_roundtrip_and_loader(raw_days, tmp_path):
    out = str(tmp_path / "out")
    art = criteo.preprocess_raw(raw_days, out, max_ind_range=500, randomize="total")
    train_bin = os.path.join(out, "train.bin")
    test_bin = os.path.join(out, "test.bin")
    val_bin = os.path.join(out, "val.bin")
    criteo.numpy_to_binary(art.day_files[:-1], train_bin, "train")
    criteo.numpy_to_binary([art.day_files[-1]], test_bin, "test")
    criteo.numpy_to_binary([art.day_files[-1]], val_bin, "val")

    # bin loader vs the npz arrays, batch by batch (_test_bin equivalence)
    ds = criteo.CriteoBinFile(train_bin, art.counts_file, batch_size=16)
    ys, denses, cats = [], [], []
    for p in art.day_files[:-1]:
        with np.load(p) as z:
            ys.append(z["y"])
            denses.append(z["X_int"])
            cats.append(z["X_cat"])
    y = np.concatenate(ys)
    x_int = np.concatenate(denses)
    x_cat = np.concatenate(cats)
    got_n = 0
    for i, hb in enumerate(ds):
        lo = i * 16
        n = int((hb.labels >= 0).sum())
        np.testing.assert_array_equal(hb.labels[:n, 0], y[lo : lo + n])
        np.testing.assert_allclose(
            hb.dense[:n],
            np.log1p(np.maximum(x_int[lo : lo + n], 0).astype(np.float32)),
        )
        np.testing.assert_array_equal(hb.idx[:, :n, 0].T, x_cat[lo : lo + n])
        got_n += n
    assert got_n == y.shape[0]
    # test+val halves partition the last day
    with np.load(art.day_files[-1]) as z:
        n_last = z["y"].shape[0]
    n_test = os.path.getsize(test_bin) // (4 * 40)
    n_val = os.path.getsize(val_bin) // (4 * 40)
    assert n_test + n_val == n_last
    assert n_test == int(np.ceil(n_last / 2))


def test_rank_strided_batches(raw_days, tmp_path):
    out = str(tmp_path / "out")
    art = criteo.preprocess_raw(raw_days, out, randomize="none")
    b = os.path.join(out, "t.bin")
    criteo.numpy_to_binary(art.day_files, b, "train")
    full = criteo.CriteoBinFile(b, art.counts_file, batch_size=8)
    r0 = criteo.CriteoBinFile(b, art.counts_file, batch_size=8, rank=0, world_size=2)
    r1 = criteo.CriteoBinFile(b, art.counts_file, batch_size=8, rank=1, world_size=2)
    assert len(r0) + len(r1) == full.num_batches
    assert list(r0.batch_indices())[:2] == [0, 2]
    assert list(r1.batch_indices())[:2] == [1, 3]


def test_synthetic_trace_roundtrip(tmp_path):
    # profile a trace, regenerate, re-profile: distributions must be close
    rng = np.random.RandomState(1)
    trace = rng.zipf(1.5, 400) % 50
    lines, list_sd, cumm_sd = synthetic.distribution_from_trace(trace.tolist())
    p = str(tmp_path / "dist.log")
    synthetic.write_dist_file(p, lines, list_sd, cumm_sd)
    l2, s2, c2 = synthetic.read_dist_file(p)
    assert l2 == [int(x) for x in lines]
    assert s2 == list_sd
    np.testing.assert_allclose(c2, cumm_sd)
    np.random.seed(0)
    out = synthetic.lru_trace(list(lines), list_sd, cumm_sd, 300)
    assert len(out) == 300
    assert set(out) <= set(int(x) for x in lines)


def test_synthetic_batch_generation(tmp_path):
    sizes = (30, 50)
    for k, s in enumerate(sizes):
        synthetic.synthesize_dist_fixture(str(tmp_path / f"dist_{k}.log"), s)
    np.random.seed(3)
    hb = synthetic.generate_synthetic_batch(
        4, sizes, n=8, hot_size=5,
        trace_file_template=str(tmp_path / "dist_j.log"),
    )
    assert hb.idx.shape == (2, 8, 5)
    for k, s in enumerate(sizes):
        assert hb.idx[k].max() < s
        assert (hb.wt[k].sum(axis=1) >= 1).all()  # at least one index per bag


def test_multihot_conversion():
    rng = np.random.default_rng(0)
    b = 6
    one_hot = HostBatch(
        dense=rng.random((b, 4), dtype=np.float32),
        idx=np.stack([rng.integers(0, 20, (b, 1)), rng.integers(0, 30, (b, 1))]).astype(np.int32),
        wt=np.ones((2, b, 1), np.float32),
        labels=np.ones((b, 1), np.float32),
    )
    mh = multi_hot.Multihot(
        multi_hot_sizes=[3, 5],
        num_embeddings_per_feature=[20, 30],
        batch_size=b,
        collect_freqs_stats=True,
    )
    out = mh.convert_to_multi_hot(one_hot)
    assert out.idx.shape == (2, b, 5)
    # first expanded index is the original (identity first column)
    np.testing.assert_array_equal(out.idx[0, :, 0], one_hot.idx[0, :, 0])
    np.testing.assert_array_equal(out.idx[1, :, 0], one_hot.idx[1, :, 0])
    # weights mark exactly hot_size entries
    assert (out.wt[0].sum(axis=1) == 3).all()
    assert (out.wt[1].sum(axis=1) == 5).all()
    # deterministic across instances (fixed seed 0, multi_hot.py:90)
    mh2 = multi_hot.Multihot([3, 5], [20, 30], b)
    out2 = mh2.convert_to_multi_hot(one_hot)
    np.testing.assert_array_equal(out.idx, out2.idx)
    # restartable wrapper iterates twice
    wrapped = mh.convert_dataloader([one_hot, one_hot])
    assert len(list(wrapped)) == 2
    assert len(list(wrapped)) == 2


def test_prefetcher_early_exit_no_deadlock():
    """Breaking out of the prefetched iterator must not leave the producer
    blocked on a full queue (it used to pin device batches forever)."""
    import threading
    import time as _time

    from dlrm_tpu.train.pipeline import DevicePrefetcher

    produced = []

    def loader():
        for i in range(100):
            produced.append(i)
            yield i

    before = threading.active_count()
    pf = DevicePrefetcher(loader(), to_device=lambda x: x, depth=2)
    for i, item in enumerate(pf):
        if i == 3:
            break  # early exit with the producer still active
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    assert len(produced) < 100  # it stopped early instead of draining


def test_prefetcher_resume_skip_reaches_wrapped_loader():
    """Resume fast-forward with --num-workers>0: the HostPrefetcher wrapper
    must forward set_epoch to the wrapped loader (or the bin-shuffle
    permutation is the wrong epoch's) and _skip_batches must unwrap it so
    index-enumerating loaders still skip at the index level (zero reads of
    the skipped batches)."""
    from dlrm_tpu.train.harness import _skip_batches
    from dlrm_tpu.train.pipeline import HostPrefetcher

    class FakeBinLoader:
        def __init__(self):
            self.epoch = None
            self.reads = []

        def set_epoch(self, epoch):
            self.epoch = epoch

        def batch_indices(self):
            return range(10)

        def read_batch(self, i):
            self.reads.append(i)
            return i

        def __iter__(self):
            for i in self.batch_indices():
                yield self.read_batch(i)

        def __len__(self):
            return 10

    src = FakeBinLoader()
    pf = HostPrefetcher(src, depth=2)
    pf.set_epoch(3)
    assert src.epoch == 3  # delegated through the wrapper

    skipped = _skip_batches(pf, 7)
    got = list(skipped)
    assert got == [7, 8, 9]
    assert src.reads == [7, 8, 9], (
        "skipped batches were read from disk — the index-level skip did "
        "not reach the wrapped loader"
    )


def test_prefetcher_propagates_producer_error():
    from dlrm_tpu.train.pipeline import DevicePrefetcher

    def loader():
        yield 1
        raise RuntimeError("boom")

    pf = DevicePrefetcher(loader(), to_device=lambda x: x, depth=2)
    got = []
    try:
        for item in pf:
            got.append(item)
        raised = False
    except RuntimeError:
        raised = True
    assert raised and got == [1]


def test_pipelined_trainer_steps_lr_policy():
    from dlrm_tpu.optim.lr_policy import LRPolicy
    from dlrm_tpu.train.pipeline import PipelinedTrainer

    lrs = []

    def step(params, opt_state, batch, lr):
        lrs.append(float(lr))
        return params, opt_state, 0.0, None

    policy = LRPolicy(1.0, num_warmup_steps=4, decay_start_step=4,
                      num_decay_steps=0)
    tr = PipelinedTrainer(step, {}, {}, policy)
    it = iter(range(4))
    for _ in range(4):
        tr.progress(it)
    assert lrs == sorted(lrs) and lrs[0] < lrs[-1], lrs  # warmup advanced


# -------------------------------------------------- out-of-core preprocessing


@pytest.mark.parametrize("randomize", ["total", "day"])
def test_streaming_preprocess_bit_equal_to_in_ram(raw_days, tmp_path,
                                                  randomize):
    """VERDICT r1 item 4: the out-of-core pipeline (chunked memmaps,
    chunk_rows far below a day) must produce BIT-EQUAL arrays to the
    in-RAM preprocess_raw on the same inputs."""
    from dlrm_tpu.data import criteo_stream

    ram_out = str(tmp_path / "ram")
    st_out = str(tmp_path / "st")
    art = criteo.preprocess_raw(
        raw_days, ram_out, max_ind_range=1000, sub_sample_rate=0.2,
        randomize=randomize, seed=123,
    )
    sart = criteo_stream.preprocess_raw_streaming(
        raw_days, st_out, max_ind_range=1000, sub_sample_rate=0.2,
        randomize=randomize, seed=123, chunk_rows=7,  # << one day
    )
    np.testing.assert_array_equal(art.counts, sart.counts)
    for i, (npz, pre) in enumerate(zip(art.day_files, sart.day_prefixes)):
        with np.load(npz) as z:
            np.testing.assert_array_equal(
                z["y"], np.load(pre + ".y.npy"), err_msg=f"day {i} y"
            )
            np.testing.assert_array_equal(
                z["X_int"], np.load(pre + ".X_int.npy"),
                err_msg=f"day {i} X_int",
            )
            np.testing.assert_array_equal(
                z["X_cat"], np.load(pre + ".X_cat.npy"),
                err_msg=f"day {i} X_cat",
            )


def test_streaming_bin_and_day_dataset(raw_days, tmp_path):
    """Chunked bin writer is byte-identical to numpy_to_binary; the memmap
    day-switching dataset (--memory-map) yields batches equal to the bin
    loader's (the reference's _test_bin lockstep check)."""
    from dlrm_tpu.data import criteo_stream

    ram_out = str(tmp_path / "ram")
    st_out = str(tmp_path / "st")
    art = criteo.preprocess_raw(raw_days, ram_out, seed=7)
    sart = criteo_stream.preprocess_raw_streaming(
        raw_days, st_out, seed=7, chunk_rows=11
    )
    for split, files_ram, pres in (
        ("train", art.day_files[:-1], sart.day_prefixes[:-1]),
        ("test", [art.day_files[-1]], [sart.day_prefixes[-1]]),
        ("val", [art.day_files[-1]], [sart.day_prefixes[-1]]),
    ):
        b_ram = str(tmp_path / f"{split}_ram.bin")
        b_st = str(tmp_path / f"{split}_st.bin")
        criteo.numpy_to_binary(files_ram, b_ram, split)
        criteo_stream.days_to_binary_streaming(pres, b_st, split,
                                               chunk_rows=5)
        assert open(b_ram, "rb").read() == open(b_st, "rb").read(), split

    # lockstep: day dataset vs bin loader (train, crossing day boundaries)
    train_bin = str(tmp_path / "train_ram.bin")
    bf = criteo.CriteoBinFile(train_bin, art.counts_file, batch_size=16)
    dd = criteo_stream.CriteoDayDataset(
        sart.day_prefixes, sart.counts_file, batch_size=16, split="train"
    )
    assert len(bf) == len(dd)
    for i, (a, b) in enumerate(zip(bf, dd)):
        np.testing.assert_allclose(a.dense, b.dense, err_msg=f"batch {i}")
        np.testing.assert_array_equal(a.idx, b.idx, err_msg=f"batch {i}")
        np.testing.assert_array_equal(a.wt, b.wt, err_msg=f"batch {i}")
        np.testing.assert_array_equal(a.labels, b.labels,
                                      err_msg=f"batch {i}")
    # test/val splits line up too
    for split in ("test", "val"):
        sb = criteo.CriteoBinFile(
            str(tmp_path / f"{split}_ram.bin"), art.counts_file,
            batch_size=8,
        )
        sd = criteo_stream.CriteoDayDataset(
            sart.day_prefixes, sart.counts_file, batch_size=8, split=split
        )
        assert len(sb) == len(sd)
        for a, b in zip(sb, sd):
            np.testing.assert_array_equal(a.idx, b.idx)
            np.testing.assert_array_equal(a.labels, b.labels)


def test_streaming_preprocess_parallel_workers(raw_days, tmp_path):
    """--dataset-multiprocessing equivalent: 2 worker processes produce the
    same artifacts as 1."""
    from dlrm_tpu.data import criteo_stream

    a = criteo_stream.preprocess_raw_streaming(
        raw_days, str(tmp_path / "w1"), seed=3, num_workers=1
    )
    b = criteo_stream.preprocess_raw_streaming(
        raw_days, str(tmp_path / "w2"), seed=3, num_workers=2
    )
    np.testing.assert_array_equal(a.counts, b.counts)
    for pa, pb in zip(a.day_prefixes, b.day_prefixes):
        for suf in (".y.npy", ".X_int.npy", ".X_cat.npy"):
            np.testing.assert_array_equal(
                np.load(pa + suf), np.load(pb + suf), err_msg=suf
            )
