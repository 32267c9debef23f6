"""CALVIN data layer: dataset indexing, deterministic validation windows,
padding semantics, extracted-rel-actions fast path, preprocessing CLI, and
the datamodule batch pipeline."""
import numpy as np
import pytest

from calvin_fixture import make_calvin_dataset
from mode_diffusion_policy_tpu.data.calvin_dataset import (BaseCalvinDataset,
                                                           DiskDataset,
                                                           ExtendedDiskDataset)
from mode_diffusion_policy_tpu.data.datamodule import (CalvinDataModule,
                                                       collate_episodes)
from mode_diffusion_policy_tpu.data.preprocess import extract_by_key


@pytest.fixture(scope="module")
def calvin_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("calvin")
    return make_calvin_dataset(root, n_episodes=3, ep_len=30, hw=24)


def make_ds(root, split="training", **kw):
    defaults = dict(key="lang", lang_folder="lang_annotations",
                    min_window_size=10, max_window_size=10, pad=False,
                    obs_seq_len=1, action_seq_len=10, future_range=1)
    defaults.update(kw)
    return ExtendedDiskDataset(root / split, **defaults)


def test_dataset_lengths_and_items(calvin_root):
    ds = make_ds(calvin_root)
    # 3 episodes of 30 frames, windows of 10: (30-10+1)*3 = 63... but lang
    # index uses end inclusive: range(start, end + 1 - min_window) per ep
    assert len(ds) == 3 * (29 + 1 - 10)
    item = ds[0]
    assert item["rgb_obs"]["rgb_static"].shape == (1, 24, 24, 3)
    assert item["rgb_obs"]["rgb_static"].dtype == np.uint8
    assert item["actions"].shape == (10, 7)
    assert item["robot_obs"].shape == (1, 8)  # keep_indices [[0,7],[14,15]]
    assert isinstance(item["lang_text"], str) and item["lang_text"]
    assert item["lang"].shape == (384,)


def test_actions_match_raw_frames(calvin_root):
    ds = make_ds(calvin_root)
    item = ds[5]
    start = ds.episode_lookup[5]
    raw = [np.load(calvin_root / "training" / f"episode_{i:07d}.npz")
           for i in range(start, start + 10)]
    want = np.stack([r["rel_actions"] for r in raw])
    np.testing.assert_array_equal(item["actions"], want)


def test_validation_windows_deterministic(calvin_root):
    ds = make_ds(calvin_root, split="validation", min_window_size=5,
                 max_window_size=10, pad=True)
    sizes1 = [len(ds._get_sequences(i, ds._get_window_size(i))["actions"])
              for i in range(10)]
    sizes2 = [len(ds._get_sequences(i, ds._get_window_size(i))["actions"])
              for i in range(10)]
    assert sizes1 == sizes2  # fnv-hash determinism across "epochs"


def test_relative_action_padding(calvin_root):
    ds = DiskDataset(calvin_root / "training", key="lang",
                     lang_folder="lang_annotations", min_window_size=5,
                     max_window_size=12, pad=True)
    seq = ds._get_sequences(0, 5)
    padded = ds._pad_sequence(dict(seq), 3)
    acts = padded["actions"]
    # zero-padded xyz/rot, repeated gripper (base_dataset.py:246-256)
    np.testing.assert_array_equal(acts[-3:, :-1], 0)
    np.testing.assert_array_equal(acts[-1, -1], acts[4, -1])
    np.testing.assert_array_equal(padded["rgb_obs"]["rgb_static"][-1],
                                  padded["rgb_obs"]["rgb_static"][4])


def test_extract_by_key_and_fast_path(calvin_root):
    out = extract_by_key(calvin_root / "training", "rel_actions", workers=2)
    import os
    assert os.path.exists(os.path.join(out, "ep_rel_actions.npy"))
    ds_slow = make_ds(calvin_root)
    ds_fast = make_ds(calvin_root, use_extracted_rel_actions=True)
    for i in (0, 7, 20):
        np.testing.assert_array_equal(ds_slow[i]["actions"],
                                      ds_fast[i]["actions"])


def test_datamodule_batches(calvin_root):
    def fake_lang(texts):
        return np.stack([np.full((1, 16), float(len(t)), np.float32)
                         for t in texts])

    dm = CalvinDataModule(calvin_root, batch_size=4, act_seq_len=10,
                          lang_embed=fake_lang).setup()
    batches = list(dm.train_batches(epoch=0))
    assert len(batches) == len(dm.train_dataset) // 4
    b = batches[0]
    assert b["rgb_static"].shape == (4, 1, 24, 24, 3)
    assert b["rgb_static"].dtype == np.uint8
    assert b["actions"].shape == (4, 10, 7)
    assert b["lang_emb"].shape == (4, 1, 16)
    # shuffling differs across epochs but is deterministic per epoch
    b2 = next(dm.train_batches(epoch=0))
    np.testing.assert_array_equal(b["idx"], b2["idx"])
    b3 = next(dm.train_batches(epoch=1))
    assert not np.array_equal(b["idx"], b3["idx"])


def test_collate_uses_precomputed_lang_emb(calvin_root):
    ds = make_ds(calvin_root)
    items = [ds[i] for i in range(3)]
    batch = collate_episodes(items, lang_embed=None)
    assert batch["lang_emb"].shape == (3, 1, 384)


def test_plain_disk_dataset_windows(calvin_root):
    ds = DiskDataset(calvin_root / "training", key="lang",
                     lang_folder="lang_annotations", min_window_size=8,
                     max_window_size=8, pad=False)
    item = ds[0]
    assert item["rgb_obs"]["rgb_static"].shape == (8, 24, 24, 3)
    assert item["actions"].shape == (8, 7)


def test_subset_variants(calvin_root):
    from mode_diffusion_policy_tpu.data.calvin_dataset import (
        BalancedLabeledSubsetDataset, LabeledSubsetDiskDataset,
        SubsetDiskDataset)
    kw = dict(key="lang", lang_folder="lang_annotations",
              min_window_size=10, max_window_size=10, pad=False,
              obs_seq_len=1, action_seq_len=10, future_range=1)
    full = make_ds(calvin_root)
    sub = SubsetDiskDataset(calvin_root / "training", subset_percentage=0.3,
                            **kw)
    assert 0 < len(sub) < len(full)
    assert sub[0]["actions"].shape == (10, 7)
    lab = LabeledSubsetDiskDataset(calvin_root / "training",
                                   subset_percentage=0.5, **kw)
    assert 0 < len(lab) <= len(full)
    assert isinstance(lab[0]["lang_text"], str)
    bal = BalancedLabeledSubsetDataset(calvin_root / "training",
                                       subset_percentage=0.5,
                                       min_samples_per_task=2, **kw)
    assert 0 < len(bal) <= len(full)
    assert bal[0]["actions"].shape == (10, 7)


def test_dataset_with_shm_cache(calvin_root):
    """shm-backed frame reads produce identical items to npz reads."""
    from mode_diffusion_policy_tpu.data.shm_cache import SharedEpisodeCache
    keys = ["rgb_static", "rgb_gripper", "robot_obs", "scene_obs",
            "rel_actions", "actions"]
    cache = SharedEpisodeCache.build(calvin_root / "training", keys=keys,
                                     tag="dstest")
    try:
        ds_npz = make_ds(calvin_root)
        ds_shm = make_ds(calvin_root, shm_cache=cache)
        for i in (0, 11, 40):
            a, b = ds_npz[i], ds_shm[i]
            np.testing.assert_array_equal(a["actions"], b["actions"])
            np.testing.assert_array_equal(a["rgb_obs"]["rgb_static"],
                                          b["rgb_obs"]["rgb_static"])
            np.testing.assert_array_equal(a["robot_obs"], b["robot_obs"])
    finally:
        cache.cleanup()


def test_datamodule_with_shm_cache(calvin_root):
    dm = CalvinDataModule(calvin_root, batch_size=4, act_seq_len=10,
                          use_shm_cache=True).setup()
    try:
        b = next(dm.train_batches())
        assert b["rgb_static"].shape == (4, 1, 24, 24, 3)
        # identical to the npz-backed module
        dm2 = CalvinDataModule(calvin_root, batch_size=4,
                               act_seq_len=10).setup()
        b2 = next(dm2.train_batches())
        np.testing.assert_array_equal(b["actions"], b2["actions"])
    finally:
        for c in dm._shm_caches:
            c.cleanup()


def test_multiworker_batches_deterministic(calvin_root):
    """num_workers>=1 fork-pool assembly must emit the exact same batch
    stream (order and content) as the inline path, including the
    parent-applied language embedding."""
    def fake_lang(texts):
        return np.stack([np.full((1, 16), float(len(t)), np.float32)
                         for t in texts])

    dm0 = CalvinDataModule(calvin_root, batch_size=4, act_seq_len=10,
                           lang_embed=fake_lang).setup()
    dm2 = CalvinDataModule(calvin_root, batch_size=4, act_seq_len=10,
                           lang_embed=fake_lang, num_workers=2).setup()
    ref = list(dm0.train_batches(epoch=3))
    got = list(dm2.train_batches(epoch=3))
    assert len(ref) == len(got) > 0
    for a, b in zip(ref, got):
        assert a["lang_text"] == b["lang_text"]
        for k in ("rgb_static", "rgb_gripper", "actions", "robot_obs",
                  "idx", "lang_emb"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_multiworker_over_shm_cache(calvin_root):
    """Workers re-attach the shm segments by name on unpickle
    (SharedEpisodeCache.__setstate__); the multi-process stream over the
    cache must be bit-identical to the inline npz-backed stream."""
    dm = CalvinDataModule(calvin_root, batch_size=4, act_seq_len=10,
                          use_shm_cache=True, num_workers=2).setup()
    try:
        dm0 = CalvinDataModule(calvin_root, batch_size=4,
                               act_seq_len=10).setup()
        ref = list(dm0.train_batches(epoch=1))
        got = list(dm.train_batches(epoch=1))
        assert len(ref) == len(got) > 0
        for a, b in zip(ref, got):
            for k in ("rgb_static", "rgb_gripper", "actions", "robot_obs"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    finally:
        for c in dm._shm_caches:
            c.cleanup()


class _Boom:
    """Module-level so spawn/forkserver workers can unpickle it: the failure
    happens IN the child and must propagate to the parent iterator."""

    def __len__(self):
        return 12

    def __getitem__(self, i):
        raise ValueError("synthetic loader failure")


def test_multiworker_worker_failure_propagates(calvin_root):
    dm = CalvinDataModule(calvin_root, batch_size=4, act_seq_len=10,
                          num_workers=2).setup()
    dm.train_dataset = _Boom()
    with pytest.raises(RuntimeError, match="loader worker failed"):
        next(dm.train_batches(epoch=0))


def test_multiworker_unpicklable_dataset_fails_fast(calvin_root):
    """spawn/forkserver workers need a picklable dataset; a local class must
    surface as a loader error at startup, not a hang."""
    dm = CalvinDataModule(calvin_root, batch_size=4, act_seq_len=10,
                          num_workers=1).setup()

    class Local:   # unpicklable: defined inside the test function
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {}

    dm.train_dataset = Local()
    with pytest.raises(RuntimeError, match="loader worker failed"):
        next(dm.train_batches(epoch=0))


class _CountingDataset:
    """Records every __getitem__ in a shared counter (passed through the
    Process args pickler) so the test can observe how far ahead a worker ran."""

    def __init__(self, n, counter):
        self.n = n
        self.counter = counter

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self.counter.get_lock():
            self.counter.value += 1
        return {"rgb_obs": {"rgb_static": np.zeros((1, 4, 4, 3), np.uint8),
                            "rgb_gripper": np.zeros((1, 4, 4, 3), np.uint8)},
                "actions": np.zeros((10, 7), np.float32),
                "robot_obs": np.zeros((1, 8), np.float32),
                "idx": i, "lang_text": "t"}


def test_multiworker_memory_bounded():
    """A fast worker must BLOCK after QUEUE_DEPTH undelivered batches instead
    of ballooning parent memory (the r4 reorder buffer was unbounded)."""
    import multiprocessing as mp
    import time

    from mode_diffusion_policy_tpu.data.datamodule import _WorkerPool

    counter = mp.get_context("forkserver").Value("i", 0)
    bs, n_batches = 2, 12
    ds = _CountingDataset(bs * n_batches, counter)
    pool = _WorkerPool(ds, np.arange(len(ds)), bs, num_workers=1)
    it = iter(pool)
    next(it)   # consume one batch, then let the worker run ahead
    # wait until the worker stalls (counter stable for ~0.6 s)
    prev = -1
    for _ in range(40):
        cur = counter.value
        if cur == prev:
            break
        prev = cur
        time.sleep(0.6)
    # bound: 1 consumed + QUEUE_DEPTH in the queue + 1 in assembly (+1 for
    # a put that raced the read), in items
    assert counter.value <= bs * (1 + _WorkerPool.QUEUE_DEPTH + 2), \
        counter.value
    rest = list(it)
    assert len(rest) == n_batches - 1
    assert counter.value == bs * n_batches
