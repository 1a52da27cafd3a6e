"""Column-strip (wide-row) mode of the fused serving pair kernel.

At 1024px-class widths no full-width row tile fits VMEM, so
``fused_sepconv_pair`` splits W into strips with column halos
(``ops/pallas/fused_sepconv._pair_tile_plan``).  These tests force strip
mode via a shrunken VMEM budget and pin bit-parity against the SAME
kernel in full-width mode (itself pinned against the module path in
``test_serving.py``) plus a pure-XLA composed oracle — covering the plain
pair, the packed+pool stage boundary, the two-stream decoder feed, and
int8 quantized I/O.  The plan heuristic is unit-tested at the real
1024px stage shapes so the engagement claim doesn't need a 1024px
interpret run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import unet_image_segmentation_tpu.ops.pallas.fused_sepconv as fs
from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
    LAST_PAIR_PLAN,
    _fold_affine,
    _pair_tile_plan,
    fused_sepconv_pair,
)

# budget small enough that no full-width tile >= 8 rows fits at wp=128
# lanes=128, but sw=16 strips do (see _pair_tile_plan arithmetic); the
# overhead bar is widened because tiny test strips pay proportionally
# huge aligned halos (hs = 4 wp-slices either side)
STRIP_SCALE = 0.12
STRIP_BAR = 3.0


def _force_strips(monkeypatch, scale=STRIP_SCALE, bar=STRIP_BAR):
    monkeypatch.setattr(fs, "VMEM_SCALE", scale)
    monkeypatch.setattr(fs, "STRIP_OVERHEAD_MAX", bar)
    # quant engagement is heuristically off (adjudicated); tests still
    # pin the kernel path's correctness
    monkeypatch.setattr(fs, "STRIP_ALLOW_QUANT", True)


def _rand_block(rng, c, f):
    return {
        "depthwise_kernel": jnp.asarray(
            rng.randn(3, 3, c, 1).astype(np.float32) * 0.3
        ),
        "pointwise_kernel": jnp.asarray(
            rng.randn(1, 1, c, f).astype(np.float32) * 0.3
        ),
        "scale": jnp.asarray(rng.rand(f).astype(np.float32) + 0.5),
        "offset": jnp.asarray(rng.randn(f).astype(np.float32) * 0.1),
        "mean": jnp.asarray(rng.randn(f).astype(np.float32) * 0.1),
        "var": jnp.asarray(rng.rand(f).astype(np.float32) + 0.5),
    }


def _oracle_block(x, blk):
    c = blk["depthwise_kernel"].shape[2]
    f = blk["pointwise_kernel"].shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x,
        blk["depthwise_kernel"].reshape(3, 3, c, 1).transpose(0, 1, 3, 2),
        (1, 1),
        "SAME",
        dimension_numbers=dn,
        feature_group_count=c,
    )
    y = jax.lax.conv_general_dilated(
        y,
        blk["pointwise_kernel"].reshape(1, 1, c, f),
        (1, 1),
        "SAME",
        dimension_numbers=dn,
    )
    scale, shift = _fold_affine(
        blk.get("bias"), blk.get("scale"), blk.get("offset"),
        blk.get("mean"), blk.get("var"), f,
    )
    return jnp.maximum(y * scale + shift, 0.0)


def _pair_oracle(x, b1, b2):
    return np.asarray(_oracle_block(_oracle_block(x, b1), b2))


@pytest.fixture()
def blocks(rng_np):
    c = f1 = f2 = 64  # p = 2 at w % 2 == 0
    b1 = _rand_block(rng_np, c, f1)
    b2 = _rand_block(rng_np, f1, f2)
    x = jnp.asarray(rng_np.randn(2, 16, 256, c).astype(np.float32))
    return x, b1, b2


def test_strip_plan_engages_at_1024(monkeypatch):
    """The real 1024px stage shapes (default VMEM budget) pick strips."""
    monkeypatch.setattr(fs, "VMEM_SCALE", 1.0)
    # stage 1: c=16 (padded), p=8 -> wp=128, pc=128, pf=512
    plan = _pair_tile_plan(
        1024, 128, 8, 128, 512, 512, in_b=2, out_b=2, pool=True
    )
    assert plan is not None
    tile_h, n_strips, sw, hs = plan
    assert n_strips > 1 and tile_h >= 8 and hs * 8 >= 2
    # stage 2: c=64, p=2 -> wp=256, pc=128, pf=256
    plan = _pair_tile_plan(
        512, 256, 2, 128, 256, 256, in_b=2, out_b=2, pool=True
    )
    assert plan is not None and plan[1] > 1
    # 256px stage 1 keeps the full-width fast path
    plan = _pair_tile_plan(
        256, 32, 8, 128, 512, 512, in_b=2, out_b=2, pool=True
    )
    assert plan is not None and plan[1] == 1


def test_strip_pair_matches_oracle(blocks, monkeypatch):
    x, b1, b2 = blocks
    expected = _pair_oracle(x, b1, b2)
    y_full = np.asarray(fused_sepconv_pair(x, b1, b2))
    assert LAST_PAIR_PLAN["n_strips"] == 1
    np.testing.assert_allclose(y_full, expected, atol=2e-5, rtol=1e-5)

    _force_strips(monkeypatch)
    y_strip = fused_sepconv_pair(x, b1, b2)
    assert y_strip is not None, "strip mode should engage, not fall back"
    assert LAST_PAIR_PLAN["n_strips"] > 1
    np.testing.assert_array_equal(np.asarray(y_strip), y_full)


def test_strip_pair_multitile_rows(rng_np, monkeypatch):
    """Row tiles x column strips together (n_tiles > 1, n_strips > 1)."""
    c = f1 = f2 = 64
    b1 = _rand_block(rng_np, c, f1)
    b2 = _rand_block(rng_np, f1, f2)
    x = jnp.asarray(rng_np.randn(1, 64, 256, c).astype(np.float32))
    y_full = np.asarray(fused_sepconv_pair(x, b1, b2))
    _force_strips(monkeypatch)
    y_strip = fused_sepconv_pair(x, b1, b2)
    assert y_strip is not None and LAST_PAIR_PLAN["n_strips"] > 1
    assert LAST_PAIR_PLAN["tile_h"] < 64
    np.testing.assert_array_equal(np.asarray(y_strip), y_full)


def test_strip_pool_packed_matches(blocks, monkeypatch):
    """Strip mode with the fused pool tail (DMA'd pooled output)."""
    x, b1, b2 = blocks
    ref = fused_sepconv_pair(x, b1, b2, out_packed=True, pool=True)
    assert ref is not None and LAST_PAIR_PLAN["n_strips"] == 1
    y_f, p_f, pool_f = ref
    _force_strips(monkeypatch)
    res = fused_sepconv_pair(x, b1, b2, out_packed=True, pool=True)
    assert res is not None, "strip+pool should engage"
    assert LAST_PAIR_PLAN["n_strips"] > 1
    y_s, p_s, pool_s = res
    assert p_s == p_f
    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_f))
    np.testing.assert_array_equal(np.asarray(pool_s), np.asarray(pool_f))


def test_strip_two_stream_decoder_feed(rng_np, monkeypatch):
    """Strip mode interleaving the [up | skip] concat from two packed
    streams (the decoder stage head)."""
    f = 64  # per-stream channels; concat input c = 128
    b1 = _rand_block(rng_np, 2 * f, f)
    b2 = _rand_block(rng_np, f, f)
    up = jnp.asarray(rng_np.randn(1, 16, 256, f).astype(np.float32))
    sk = jnp.asarray(rng_np.randn(1, 16, 256, f).astype(np.float32))
    expected = _pair_oracle(jnp.concatenate([up, sk], axis=-1), b1, b2)

    p = fs.pair_pack(2 * f, f, f, 256)
    assert p and p >= 2
    wp = 256 // p

    def pack(t):
        return t.reshape(1, 16, wp, p * f)

    y_full = fused_sepconv_pair(pack(up), b1, b2, in_packed=p, x2=pack(sk))
    assert y_full is not None and LAST_PAIR_PLAN["n_strips"] == 1
    y_full = np.asarray(y_full).reshape(1, 16, 256, f)
    np.testing.assert_allclose(y_full, expected, atol=2e-5, rtol=1e-5)

    _force_strips(monkeypatch)
    y_strip = fused_sepconv_pair(pack(up), b1, b2, in_packed=p, x2=pack(sk))
    assert y_strip is not None and LAST_PAIR_PLAN["n_strips"] > 1
    np.testing.assert_array_equal(
        np.asarray(y_strip).reshape(1, 16, 256, f), y_full
    )


def test_strip_quant_io_matches_fullwidth(rng_np, monkeypatch):
    """Int8 I/O through strip mode == the full-width int8 kernel.

    int8's (32, 128) tiling forces hs = 16 halo wp-slices, so a wider
    image (w=512) and budget window force the engagement."""
    c = f1 = f2 = 64
    b1 = _rand_block(rng_np, c, f1)
    b2 = _rand_block(rng_np, f1, f2)
    x = jnp.asarray(rng_np.randn(1, 16, 512, c).astype(np.float32))
    s_in, s_out = 2.0 ** -5, 2.0 ** -4
    xq = jnp.clip(jnp.round(x / s_in), -127, 127).astype(jnp.int8)
    ref = fused_sepconv_pair(
        xq, b1, b2, in_scale=s_in, out_scale=s_out,
        compute_dtype=jnp.float32,
    )
    assert ref is not None and LAST_PAIR_PLAN["n_strips"] == 1
    _force_strips(monkeypatch, scale=0.2)
    got = fused_sepconv_pair(
        xq, b1, b2, in_scale=s_in, out_scale=s_out,
        compute_dtype=jnp.float32,
    )
    assert got is not None and LAST_PAIR_PLAN["n_strips"] > 1
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
