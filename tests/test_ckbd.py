import jax.numpy as jnp
import numpy as np

from rdeic_tpu.ops import ckbd


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype("f4"))


def test_split_merge_partition():
    y = _rand((2, 8, 10, 5))
    a, na = ckbd.ckbd_split(y)
    np.testing.assert_array_equal(np.asarray(a + na), np.asarray(y))
    # disjoint support
    assert np.all((np.asarray(a) == 0) | (np.asarray(na) == 0))


def test_anchor_positions():
    y = jnp.ones((1, 4, 4, 1))
    a = np.asarray(ckbd.ckbd_anchor(y))[0, :, :, 0]
    expected = np.array(
        [[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0]], dtype="f4"
    )
    np.testing.assert_array_equal(a, expected)


def test_squeeze_unsqueeze_inverse():
    y = _rand((3, 16, 12, 7), seed=1)
    a = ckbd.ckbd_anchor(y)
    na = ckbd.ckbd_nonanchor(y)
    a_sq = ckbd.ckbd_anchor_squeeze(y)
    na_sq = ckbd.ckbd_nonanchor_squeeze(y)
    assert a_sq.shape == (3, 16, 6, 7)
    np.testing.assert_array_equal(
        np.asarray(ckbd.ckbd_anchor_unsqueeze(a_sq)), np.asarray(a)
    )
    np.testing.assert_array_equal(
        np.asarray(ckbd.ckbd_nonanchor_unsqueeze(na_sq)), np.asarray(na)
    )


def test_squeeze_row_layout():
    # even output rows hold (even row, odd col) anchors; odd rows hold
    # (odd row, even col) anchors — matching the reference packing.
    y = jnp.arange(4 * 4, dtype=jnp.float32).reshape(1, 4, 4, 1)
    sq = np.asarray(ckbd.ckbd_anchor_squeeze(y))[0, :, :, 0]
    expected = np.array([[1, 3], [4, 6], [9, 11], [12, 14]], dtype="f4")
    np.testing.assert_array_equal(sq, expected)
