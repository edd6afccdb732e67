"""Unit tests: profiler timers/counters, heatmap, bitmap, u64 helpers."""

import io
import time

import numpy as np

from quicked_tpu.utils.bitmap import Bitmap
from quicked_tpu.utils.heatmap import HEATMAP_MAX, HEATMAP_MIN, Heatmap
from quicked_tpu.utils.profiler import Counter, Timer


def test_counter_welford():
    c = Counter()
    data = [4, 7, 13, 16]
    for x in data:
        c.add(x)
    assert c.total == sum(data)
    assert c.samples == 4
    assert c.min == 4 and c.max == 16
    assert abs(c.mean() - np.mean(data)) < 1e-9
    assert abs(c.variance() - np.var(data, ddof=1)) < 1e-9


def test_timer_pause_resume():
    t = Timer()
    t.start()
    time.sleep(0.01)
    t.pause()
    paused_at = t.total_ns()
    time.sleep(0.02)
    assert t.total_ns() == paused_at  # no accumulation while paused
    assert paused_at >= 8_000_000  # the open lap counts while paused
    t.resume()
    time.sleep(0.01)
    t.stop()
    assert t.count.total >= 15_000_000  # ~20ms active
    assert t.count.samples == 1         # one lap = one sample
    buf = io.StringIO()
    t.print(buf)
    assert "ms" in buf.getvalue()
    # stop while paused still records the lap, exactly once
    t2 = Timer()
    t2.start()
    time.sleep(0.005)
    t2.pause()
    t2.stop()
    assert t2.count.samples == 1 and t2.count.total >= 3_000_000
    t2.stop()                            # idle stop: no spurious sample
    assert t2.count.samples == 1


def test_heatmap_modes():
    hm = Heatmap(4, 4, 0, 100, 0, 100, mode=HEATMAP_MAX)
    hm.set(10, 10, 5)
    hm.set(12, 12, 9)      # same bin, larger
    assert hm.values[0, 0] == 9
    hm2 = Heatmap(4, 4, 0, 100, 0, 100, mode=HEATMAP_MIN)
    hm2.set(10, 10, 5)
    hm2.set(12, 12, 9)
    assert hm2.values[0, 0] == 5
    buf = io.StringIO()
    hm.print(buf)
    assert len(buf.getvalue().splitlines()) == 4


def test_bitmap_rank():
    bm = Bitmap(300)
    positions = [0, 1, 63, 64, 130, 299]
    for p in positions:
        bm.set_bit(p)
    for p in positions:
        assert bm.is_set(p)
    assert not bm.is_set(2)
    bm.update_counters()
    assert bm.erank(0) == 0
    assert bm.erank(2) == 2
    assert bm.erank(64) == 3
    assert bm.erank(300 - 1) == 5


def test_u64_shifts():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quicked_tpu.ops import u64

    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 64, size=64, dtype=np.uint64)
    shifts = np.arange(64, dtype=np.int32)
    lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    s = jnp.asarray(shifts)
    rlo, rhi = u64.shr64(lo, hi, s)
    llo, lhi = u64.shl64(lo, hi, s)
    for i in range(64):
        v = int(vals[i])
        got_r = int(rlo[i]) | (int(rhi[i]) << 32)
        got_l = int(llo[i]) | (int(lhi[i]) << 32)
        assert got_r == v >> i, i
        assert got_l == (v << i) & ((1 << 64) - 1), i
    # bit extraction
    idx = jnp.asarray(shifts)
    bits = u64.bit64(lo, hi, idx)
    for i in range(64):
        assert int(bits[i]) == (int(vals[i]) >> i) & 1


def test_mm_stack():
    from quicked_tpu.utils.mm_stack import MMStack

    st = MMStack(segment_size=64)
    st.push()
    a = st.allocate(16, zero=True)
    assert a.shape == (16,) and int(a.sum()) == 0
    b = st.allocate(40)        # spills within segment budget
    c = st.allocate(100)       # oversized: own segment
    assert b.shape == (40,) and c.shape == (100,)
    st.push()
    st.allocate(30)
    st.pop()                   # frees the inner scope
    d = st.allocate(30)
    assert d.shape == (30,)
    st.pop()                   # outer scope unwinds fully
    e = st.allocate(8)
    assert e.shape == (8,)


def test_counter_add_repeat_matches_loop():
    from quicked_tpu.utils.profiler import Counter

    # all-equal fast path (the CIGAR-breakdown pattern)
    a, b = Counter(), Counter()
    a.add_repeat(1, 5)
    for _ in range(5):
        b.add(1)
    assert (a.total, a.samples, a.min, a.max) == \
        (b.total, b.samples, b.min, b.max)
    assert a.mean() == b.mean() and a.stddev() == b.stddev()
    # mixed-value fallback stays bit-exact with the sequential loop
    a.add(3)
    b.add(3)
    a.add_repeat(2, 4)
    for _ in range(4):
        b.add(2)
    assert a.mean() == b.mean() and a.stddev() == b.stddev()
    assert (a.total, a.samples, a.min, a.max) == \
        (b.total, b.samples, b.min, b.max)


def test_memreport_records_and_reports():
    """utils.memreport — the mm_allocator occupancy analogue
    (mm_allocator.c:573-604): engine allocations are recorded, budgets
    and host RSS surface in the report, and the printed block renders."""
    import io

    from quicked_tpu.utils import memreport

    memreport.reset()
    memreport.record("FullFill.Planes", 1 << 20)
    memreport.record("FullFill.Planes", 1 << 22)
    rep = memreport.memory_report()
    st = rep["recorded"]["FullFill.Planes"]
    assert st["count"] == 2
    assert st["bytes"] == (1 << 20) + (1 << 22)
    assert st["peak"] == 1 << 22
    assert rep["budgets"]["full_fill_bytes_budget"] > 0
    assert rep["host"].get("vmrss", 0) > 0
    buf = io.StringIO()
    memreport.print_report(buf)
    out = buf.getvalue()
    assert "[Memory]" in out and "FullFill.Planes" in out
    memreport.reset()


def test_memreport_captures_engine_full_fill():
    """A real full-alignment batch records its traceback-plane bytes."""
    from quicked_tpu import generate
    from quicked_tpu.aligner.batch import banded_align_batch
    from quicked_tpu.utils import memreport

    memreport.reset()
    pairs = list(generate.generate_pairs(4, 200, error=0.1, seed=3))
    cutoffs = [max(len(p), len(t)) * 20 // 100 for p, t in pairs]
    sc, ops = banded_align_batch([p for p, _ in pairs],
                                 [t for _, t in pairs], cutoffs,
                                 only_score=False)
    assert all(o for o in ops)
    rep = memreport.memory_report()
    # CPU platform: fills may take the per-pair native path (no plane
    # allocation) — force the staged path check only when recorded
    if "FullFill.Planes" in rep["recorded"]:
        assert rep["recorded"]["FullFill.Planes"]["bytes"] > 0
    memreport.reset()
