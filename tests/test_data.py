"""Data layer tests: chunk store / LRU cache, sampling, mining, collation."""

import numpy as np
import pytest

import jax

from qst_tpu.core.config import (
    KEY_NEGATIVE,
    KEY_PART_POSITIVE,
    KEY_POSITIVE,
    KEY_REFERENCE,
)
from qst_tpu.data import (
    ChunkStore,
    EmbeddingTable,
    NegativeMiner,
    QuadrupletBatch,
    QuadrupletCollator,
    QuadrupletDataset,
    RANDOM,
    HARD_CONTRASTIVE_TRAIN,
    choose_examples,
    mine_negatives,
    select_single_example,
)
from qst_tpu.models import HashTokenizer

from helpers import hash_embed, make_instances, write_synthetic_dataset


@pytest.fixture
def dataset_root(tmp_path):
    root = str(tmp_path / "chunks")
    total = write_synthetic_dataset(root, n_chunks=4, chunk_dim=6)
    return root, total


def test_chunk_store_basic(dataset_root):
    root, total = dataset_root
    store = ChunkStore(root, cache_size=2)
    assert store.n_chunks == 4
    assert len(store) == total
    inst = store.get_instance(0)
    assert KEY_REFERENCE in inst and KEY_POSITIVE in inst
    assert store.get_instance(total - 1)["id"] == total - 1
    with pytest.raises(IndexError):
        store.locate(total + 100)


def test_chunk_store_lru_eviction(dataset_root):
    root, _ = dataset_root
    store = ChunkStore(root, cache_size=2)
    h0, m0 = store.hits, store.misses
    # scripted access pattern forcing hits, misses, evictions
    # (the reference exercised its cache the same way, part_pos_dataset.ipynb
    # cells 36/37 and dataset/main.py --verbose_check)
    # constructor probed chunks {0, 3}, so the cache starts as [0, 3]
    store.get_chunk(0)          # hit → [3, 0]
    store.get_chunk(0)          # hit
    store.get_chunk(1)          # miss → evicts 3 → [0, 1]
    store.get_chunk(2)          # miss → evicts 0 → [1, 2]
    store.get_chunk(0)          # miss again (was evicted) → [2, 0]
    store.get_chunk(2)          # hit
    assert store.hits - h0 == 3
    assert store.misses - m0 == 3
    assert len(store._cache) <= 2


def test_chunk_store_validation(tmp_path, dataset_root):
    root, _ = dataset_root
    with pytest.raises(ValueError):
        ChunkStore(root, cache_size=0)
    with pytest.raises(FileNotFoundError):
        ChunkStore(str(tmp_path / "nope"))


def test_choose_examples(rng):
    pool = ["a", "b", "c"]
    out = choose_examples(pool, 2, rng)
    assert len(out) == 2 and len(set(out)) == 2
    out5 = choose_examples(pool, 5, rng)
    assert len(out5) == 5 and set(out5) <= set(pool)
    with pytest.raises(ValueError):
        choose_examples([], 1, rng)


def test_mine_negatives_threshold_and_modes():
    # Anchor = topic "cat"; table = mix of same-topic (high cos) and
    # other-topic (low cos) captions.
    anchors = ["a cat sits on the mat"]
    table_texts = [
        "the cat rests on a mat",          # same topic → cos high → invalid
        "a dog runs in the park",
        "a red car drives down the road",
        "a plate of pasta with sauce",
        "an airplane flies through clouds",
    ]
    a = hash_embed(anchors)
    t = hash_embed(table_texts)
    idx, ok = mine_negatives(
        jax.numpy.asarray(a), jax.numpy.asarray(t), jax.random.key(0),
        n_neg=2, hard=False, threshold=0.2)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.all()
    assert 0 not in idx[0]  # same-topic caption excluded

    # hard mode: picks the valid candidates with LARGEST cosine
    cos = (a / np.linalg.norm(a)) @ (t / np.linalg.norm(t, axis=1, keepdims=True)).T
    valid = np.where(cos[0] <= 0.2)[0]
    hardest = valid[np.argsort(-cos[0][valid])][:2]
    idx_h, ok_h = mine_negatives(
        jax.numpy.asarray(a), jax.numpy.asarray(t), jax.random.key(0),
        n_neg=2, hard=True, threshold=0.2)
    np.testing.assert_array_equal(np.sort(np.asarray(idx_h)[0]), np.sort(hardest))


def test_mine_negatives_short_pool_replicates():
    anchors = ["a cat sits on the mat"]
    # only ONE valid negative exists
    table_texts = ["the cat rests on a mat", "a dog runs in the park"]
    a, t = hash_embed(anchors), hash_embed(table_texts)
    table = EmbeddingTable(table_texts, lambda xs: hash_embed(list(xs)))
    miner = NegativeMiner(table, lambda xs: hash_embed(list(xs)), mode=RANDOM)
    negs = miner.mine(anchors, n_neg=3)
    assert len(negs[0]) == 3
    assert set(negs[0]) == {"a dog runs in the park"}  # replicated


def test_quadruplet_dataset_getitem(dataset_root):
    root, total = dataset_root
    ds = QuadrupletDataset(root, n_pos=2, n_part_pos=2, n_neg=1, seed=3)
    item = ds[0]
    assert set(item) >= {KEY_REFERENCE, KEY_POSITIVE, KEY_PART_POSITIVE, KEY_NEGATIVE}
    assert len(item[KEY_POSITIVE]) == 2
    assert len(item[KEY_NEGATIVE]) == 1
    # list indexing (reference accepted int/tensor/list, :372-403)
    items = ds[[0, 1, 2]]
    assert len(items) == 3
    assert len(ds) == total


def test_quadruplet_dataset_with_miner(dataset_root):
    root, _ = dataset_root
    store = ChunkStore(root)
    pool = store.all_positive_captions()
    table = EmbeddingTable(pool, lambda xs: hash_embed(list(xs)))
    miner = NegativeMiner(table, lambda xs: hash_embed(list(xs)),
                          mode=HARD_CONTRASTIVE_TRAIN)
    ds = QuadrupletDataset(root, miner=miner, n_neg=2, seed=5)
    batches = list(ds.iter_batches(batch_size=8, epoch=0))
    assert len(batches) == len(ds) // 8
    for batch in batches:
        assert len(batch) == 8
        for item in batch:
            assert len(item[KEY_NEGATIVE]) == 2
            # mined negative must be a different topic than the anchor
            a = hash_embed([item[KEY_REFERENCE]])
            n = hash_embed(item[KEY_NEGATIVE])
            cos = (a @ n.T)[0]
            assert np.all(cos <= 0.2 + 1e-5)


def test_dataset_validation(dataset_root):
    root, _ = dataset_root
    with pytest.raises(ValueError):
        QuadrupletDataset(root, n_pos=0)


def test_select_single_example(rng):
    inst = {
        KEY_REFERENCE: "ref",
        KEY_POSITIVE: ["p1", "p2"],
        KEY_PART_POSITIVE: ["t1"],
        KEY_NEGATIVE: ["n1", "n2", "n3"],
    }
    out = select_single_example(inst, rng)
    assert out[KEY_REFERENCE] == "ref"
    assert out[KEY_POSITIVE] in inst[KEY_POSITIVE]
    assert out[KEY_PART_POSITIVE] == "t1"
    assert out[KEY_NEGATIVE] in inst[KEY_NEGATIVE]
    with pytest.raises(ValueError):
        select_single_example({**inst, KEY_POSITIVE: []}, rng)


def test_collator_shapes(dataset_root):
    root, _ = dataset_root
    ds = QuadrupletDataset(root, n_pos=2, n_part_pos=2, n_neg=2, seed=1)
    collate = QuadrupletCollator(HashTokenizer(vocab_size=256), max_length=16)
    batch = collate(ds[[0, 1, 2, 3]])
    assert isinstance(batch, QuadrupletBatch)
    assert batch.input_ids.shape == (4, 4, 16)
    assert batch.attention_mask.shape == (4, 4, 16)
    ids, mask = batch.flat()
    assert ids.shape == (16, 16)
    # role 0 row 0 must be the tokenized anchor of instance 0
    np.testing.assert_array_equal(ids[0], batch.input_ids[0, 0])


def test_dataset_from_config(dataset_root):
    from qst_tpu.core.config import DataConfig

    root, total = dataset_root
    cfg = DataConfig(root=root, n_pos=2, n_part_pos=1, n_neg=2,
                     hard_contrastive_mode=HARD_CONTRASTIVE_TRAIN,
                     neg_sim_threshold=0.2, mining_refresh_steps=10, seed=3)
    ds = QuadrupletDataset.from_config(cfg, encode_fn=lambda t: hash_embed(list(t)))
    assert len(ds) == total
    assert ds.miner is not None
    assert ds.miner.threshold == 0.2
    item = ds[0]
    assert len(item[KEY_POSITIVE]) == 2 and len(item[KEY_NEGATIVE]) == 2
    # config without encode_fn → no miner (random fallback)
    ds2 = QuadrupletDataset.from_config(cfg)
    assert ds2.miner is None


def test_miner_retries_resample_fresh_pools():
    """max_attempts observably changes outcomes (reference
    quadruplet_dataset.py:199-239: each attempt draws a fresh candidate
    pool, so a failed attempt can succeed against new candidates)."""
    anchors = ["a cat sits on the mat"]
    # One valid negative in a table of near-duplicates of the anchor: a
    # 1-candidate sub-pool (pool_factor=1, n_neg=1) usually misses it on
    # the first draw, so retries are what find it.
    dupes = [f"a cat sits on the mat {i}" for i in range(9)]
    table_texts = dupes + ["a dog runs in the park"]
    a = hash_embed(anchors)
    t = hash_embed(table_texts)
    cos = (a / np.linalg.norm(a)) @ (
        t / np.linalg.norm(t, axis=1, keepdims=True)).T
    valid = set(np.where(cos[0] <= 0.2)[0].tolist())
    assert valid, "fixture broken: need at least one valid negative"

    def build(max_attempts, seed):
        table = EmbeddingTable(table_texts, lambda xs: hash_embed(list(xs)))
        return NegativeMiner(table, lambda xs: hash_embed(list(xs)),
                             mode=RANDOM, max_attempts=max_attempts,
                             pool_factor=1, seed=seed)

    # With enough attempts, some seed must recover a valid negative after a
    # failed first attempt — and the 1-attempt miner with the same seed must
    # NOT (identical first draw, no retry).
    observed_difference = False
    for seed in range(20):
        one = build(1, seed).mine(anchors, n_neg=1)
        many = build(8, seed).mine(anchors, n_neg=1)
        one_valid = one[0][0] == "a dog runs in the park"
        many_valid = many[0][0] == "a dog runs in the park"
        assert many_valid or not one_valid  # retries never make it worse
        if many_valid and not one_valid:
            observed_difference = True
    assert observed_difference, "max_attempts never changed the outcome"


def test_miner_hard_mode_retries():
    """Hard-contrastive mode also retries on empty pools (the old code
    short-circuited: break on hard)."""
    anchors = ["a cat sits on the mat"]
    dupes = [f"a cat sits on the mat {i}" for i in range(9)]
    table_texts = dupes + ["a dog runs in the park"]
    found = False
    for seed in range(20):
        table = EmbeddingTable(table_texts, lambda xs: hash_embed(list(xs)))
        miner = NegativeMiner(table, lambda xs: hash_embed(list(xs)),
                              mode=HARD_CONTRASTIVE_TRAIN, max_attempts=8,
                              pool_factor=1, seed=seed)
        one_table = EmbeddingTable(table_texts,
                                   lambda xs: hash_embed(list(xs)))
        one = NegativeMiner(one_table, lambda xs: hash_embed(list(xs)),
                            mode=HARD_CONTRASTIVE_TRAIN, max_attempts=1,
                            pool_factor=1, seed=seed)
        many_valid = miner.mine(anchors, n_neg=1)[0][0] == \
            "a dog runs in the park"
        one_valid = one.mine(anchors, n_neg=1)[0][0] == \
            "a dog runs in the park"
        if many_valid and not one_valid:
            found = True
    assert found
