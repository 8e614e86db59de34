import numpy as np

from thecrowler_ray.state.cuckoo import CuckooFilter


def test_insert_contains_exact():
    f = CuckooFilter(log2_buckets=10, exact=True, seed=1)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**63, size=2000, dtype=np.uint64)
    keys = np.unique(keys)
    half = keys[: len(keys) // 2]
    other = keys[len(keys) // 2:]
    f.insert_many(half)
    assert f.contains_many(half).all()
    # exact mode: zero false positives
    assert not f.contains_many(other).any()


def test_grow_on_overfull():
    f = CuckooFilter(log2_buckets=4, exact=True, seed=1)  # 16 buckets × 4 slots
    keys = np.arange(1, 500, dtype=np.uint64) * np.uint64(2654435761)
    f.insert_many(keys)  # forces grow
    assert f.contains_many(keys).all()
    assert f.n_buckets > 16


def test_serialize_roundtrip():
    f = CuckooFilter(log2_buckets=8, exact=True, seed=2)
    keys = np.arange(100, 400, dtype=np.uint64) * np.uint64(11400714819323198485)
    f.insert_many(keys)
    g = CuckooFilter.loads(f.dumps())
    assert g.contains_many(keys).all()
    assert g.count == f.count
    probe = np.arange(1, 50, dtype=np.uint64) * np.uint64(2654435761)
    assert (g.contains_many(probe) == f.contains_many(probe)).all()


def test_approximate_mode_no_false_negatives():
    f = CuckooFilter(log2_buckets=12, exact=False, seed=3)
    keys = np.arange(1, 3000, dtype=np.uint64) * np.uint64(2654435761)
    f.insert_many(keys)
    assert f.contains_many(keys).all()  # cuckoo filters never false-negative


def test_fp_rate_close_to_theory():
    """Non-exact mode: measured false-positive rate within ~4x of the
    theoretical bound b*2/2^f (4 slots, 16-bit fingerprints) — the
    documented 10^10-scale tradeoff when the exact sidecar is disabled."""
    f = CuckooFilter(log2_buckets=12, exact=False, seed=9)
    rng = np.random.default_rng(1)
    present = np.unique(rng.integers(0, 2**63, size=8000, dtype=np.uint64))
    f.insert_many(present)
    probe = np.unique(rng.integers(0, 2**63, size=200_000, dtype=np.uint64))
    probe = np.setdiff1d(probe, present, assume_unique=True)
    fp = f.contains_many(probe).mean()
    theory = 2 * 4 / 65536  # 2 buckets x 4 slots x 2^-16
    assert fp < theory * 4
    assert fp >= 0


def test_exact_sidecar_spill_roundtrip(tmp_path):
    """Spill tier: membership stays exact across spilled runs, compaction
    bounds the run count, and a snapshot of a spilled filter restores."""
    import numpy as np
    import os

    from thecrowler_ray.state.cuckoo import CuckooFilter

    spill = str(tmp_path / "spill")
    f = CuckooFilter(log2_buckets=16, exact=True, spill_dir=spill,
                     merge_threshold=1000, spill_threshold=2000)
    rng = np.random.default_rng(3)
    keys = rng.integers(1, 2**63, size=50_000, dtype=np.int64).astype(np.uint64)
    keys = np.unique(keys)
    for i in range(0, len(keys), 1500):
        f.insert_many(keys[i : i + 1500])
    # spilled: several runs on disk, RAM array bounded
    assert f._runs, "expected spilled runs"
    assert len(f._runs) <= CuckooFilter.MAX_RUNS + 1
    assert len(f._exact_sorted) < 2000 + 1500
    assert all(os.path.exists(p) for p in f._runs)
    # exact membership: all inserted keys hit, fresh keys miss
    assert f.contains_many(keys).all()
    fresh = rng.integers(1, 2**63, size=20_000, dtype=np.int64).astype(np.uint64)
    fresh = fresh[~np.isin(fresh, keys)]
    assert not f.contains_many(fresh).any()
    # snapshot → restore (restore is RAM-resident; membership preserved)
    g = CuckooFilter.loads(f.dumps())
    assert g.contains_many(keys).all()
    assert not g.contains_many(fresh).any()


def test_spill_equals_ram_membership(tmp_path):
    """Spilling is invisible to callers: identical verdicts vs an all-RAM
    filter over the same insert/probe sequence."""
    import numpy as np

    from thecrowler_ray.state.cuckoo import CuckooFilter

    ram = CuckooFilter(log2_buckets=14, exact=True)
    sp = CuckooFilter(log2_buckets=14, exact=True,
                      spill_dir=str(tmp_path / "s"),
                      merge_threshold=64, spill_threshold=128)
    rng = np.random.default_rng(9)
    for _ in range(30):
        batch = rng.integers(1, 2**62, size=200, dtype=np.int64).astype(np.uint64)
        probe_ram = ram.contains_many(batch)
        probe_sp = sp.contains_many(batch)
        np.testing.assert_array_equal(probe_ram, probe_sp)
        new = batch[~probe_ram]
        new = np.unique(new)
        ram.insert_many(new)
        sp.insert_many(new)
