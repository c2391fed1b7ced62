"""Quadtree plan tests.

`SlowTree` is an independent, direct implementation of the partitioning spec
(explicit recursion, per-region scans) used as the oracle for the vectorized
Morton-order planner.  It mirrors the documented reference behavior:
split = size > max OR (size > min AND region-has-edge); children TL,TR,BL,BR;
nodes with origin outside the image serialize as 'absent'.
"""

import numpy as np
import pytest

from aejpeg_tpu.codec import quadtree as qt
from aejpeg_tpu.utils import root_size_for


class SlowTree:
    def __init__(self, edge, max_size, min_size):
        self.edge = edge
        self.max = max_size
        self.min = min_size
        self.h, self.w = edge.shape
        self.root = root_size_for(self.h, self.w)
        self.states = []
        self.leaves = []  # (size, y, x)
        self._visit(0, 0, self.root)

    def _visit(self, x, y, size):
        if x >= self.w or y >= self.h:
            self.states.append(qt.STATE_ABSENT)
            return
        region = self.edge[y:y + size, x:x + size]
        if size > self.max or (size > self.min and np.any(region == 1.0)):
            self.states.append(qt.STATE_SPLIT)
            half = size // 2
            self._visit(x, y, half)
            self._visit(x + half, y, half)
            self._visit(x, y + half, half)
            self._visit(x + half, y + half, half)
        else:
            self.states.append(qt.STATE_LEAF)
            self.leaves.append((size, y, x))


SHAPES = [(64, 64), (64, 48), (50, 70), (33, 17), (128, 128), (129, 65),
          (512, 512), (1, 7), (8, 8)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("sizes", [(4, 64), (8, 8), (4, 16), (16, 128)])
def test_plan_matches_slow_tree(shape, sizes):
    rng = np.random.default_rng(hash((shape, sizes)) % 2 ** 31)
    edge = (rng.random(shape) < 0.02).astype(np.float32)
    mn, mx = sizes
    slow = SlowTree(edge, mx, mn)
    plan = qt.build_plan(edge, mx, mn)

    assert plan.root_size == slow.root
    np.testing.assert_array_equal(plan.states,
                                  np.asarray(slow.states, np.uint8))
    want = np.asarray(slow.leaves, np.int64).reshape(-1, 3)
    np.testing.assert_array_equal(plan.leaf_sizes, want[:, 0])
    np.testing.assert_array_equal(plan.leaf_y, want[:, 1])
    np.testing.assert_array_equal(plan.leaf_x, want[:, 2])


@pytest.mark.parametrize("shape", [(64, 64), (50, 70), (129, 65)])
def test_replay_and_decode(shape):
    rng = np.random.default_rng(3)
    edge = (rng.random(shape) < 0.05).astype(np.float32)
    plan = qt.build_plan(edge, 64, 4)

    sizes = qt.decode_leaf_sizes(plan.states, plan.root_size)
    np.testing.assert_array_equal(sizes, plan.leaf_sizes)

    rs, ry, rx = qt.replay_positions(plan.states, plan.root_size,
                                     *shape)
    np.testing.assert_array_equal(rs, plan.leaf_sizes)
    np.testing.assert_array_equal(ry, plan.leaf_y)
    np.testing.assert_array_equal(rx, plan.leaf_x)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    states = rng.integers(0, 3, size=1001).astype(np.uint8)
    data, bits_len = qt.pack_states(states)
    assert bits_len == 2002
    assert len(data) == (bits_len + 7) // 8
    back = qt.unpack_states(data, bits_len)
    np.testing.assert_array_equal(back, states)


def test_pack_matches_reference_bit_layout():
    """'00','01','10' strings joined MSB-first, zero-padded to bytes
    (src/jpeg/jpeg.py:563-577)."""
    states = np.asarray([1, 0, 2, 0, 0], np.uint8)  # '01'+'00'+'10'+'00'+'00'
    data, bits_len = qt.pack_states(states)
    bits_string = "0100100000".ljust(16, "0")
    want = int(bits_string, 2).to_bytes(2, "big")
    assert data == want
    assert bits_len == 10


def test_full_coverage_no_overlap():
    """Leaves exactly tile the in-bounds image area."""
    rng = np.random.default_rng(9)
    edge = (rng.random((100, 60)) < 0.05).astype(np.float32)
    plan = qt.build_plan(edge, 32, 4)
    canvas = np.zeros((plan.root_size, plan.root_size), np.int32)
    for s, y, x in zip(plan.leaf_sizes, plan.leaf_y, plan.leaf_x):
        canvas[y:y + s, x:x + s] += 1
    assert canvas.max() == 1
    # every in-bounds pixel covered
    assert (canvas[:100, :60] == 1).all()


def test_uniform_grid_when_min_equals_max():
    """min == max == 8 must reproduce the plain JPEG 8x8 grid regardless of
    edges (split predicate can never fire at size 8)."""
    edge = np.ones((32, 32), np.float32)
    plan = qt.build_plan(edge, 8, 8)
    assert set(plan.leaf_sizes.tolist()) == {8}
    assert len(plan.leaf_sizes) == 16


def test_native_build_plan_matches_python():
    """The C++ DFS planner must emit identical states and preorder leaves
    to the Python mask-pyramid planner over random edge maps."""
    from aejpeg_tpu.codec import quadtree as qt
    from aejpeg_tpu.native.entropy import build_plan as native_build_plan
    import numpy as np
    rng = np.random.default_rng(3)
    for (h, w, mx, mn) in [(96, 128, 32, 4), (100, 120, 64, 4),
                           (50, 94, 64, 8), (64, 64, 8, 8),
                           (7, 9, 16, 4)]:
        edge = (rng.random((h, w)) < 0.02).astype(np.float32)
        want = qt.build_plan(edge, mx, mn)
        if mx == mn:
            continue  # uniform path never consults levels
        root = qt.root_size_for(h, w)
        pyr = qt.edge_pyramid(edge, root)
        k_lo = mn.bit_length()      # log2(mn) + 1
        k_hi = mx.bit_length() - 1  # log2(mx)
        concat, offs, pos = [], [], 0
        for k in range(k_lo, k_hi + 1):
            g = root >> k
            m = pyr[k][:g, :g].astype(np.uint8)
            concat.append(m.ravel())
            offs.append(pos)
            pos += g * g
        res = native_build_plan(np.concatenate(concat), np.asarray(offs),
                                k_lo, k_hi, root, h, w, mx, mn)
        assert res is not None
        states, sizes, ys, xs = res
        np.testing.assert_array_equal(states, want.states)
        np.testing.assert_array_equal(sizes, want.leaf_sizes)
        np.testing.assert_array_equal(ys, want.leaf_y)
        np.testing.assert_array_equal(xs, want.leaf_x)
