"""Codec round-trips, PSNR gate, fixture determinism, and the per-row
payload invariants (BASELINE.json input_hint; SURVEY.md §5.2-3)."""

import numpy as np
import pandas as pd
import pytest

from profet_spark import fixtures, imaging


def _rand_img(seed, w=48, h=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["ppm", "png"])
def test_roundtrip_exact(fmt):
    arr = _rand_img(1)
    data = imaging.ENCODERS[fmt](arr)
    back = imaging.decode(data, fmt)
    np.testing.assert_array_equal(arr, back)
    assert imaging.psnr(arr, back) == float("inf")


def test_psnr_gate():
    a = _rand_img(2)
    noisy = np.clip(a.astype(np.int16) + np.random.default_rng(3).integers(-2, 3, a.shape), 0, 255).astype(np.uint8)
    assert imaging.psnr(a, noisy) >= 40.0  # small noise passes the gate
    garbage = _rand_img(4)
    assert imaging.psnr(a, garbage) < 20.0


def test_decode_unknown_fmt_raises():
    with pytest.raises(NotImplementedError):
        imaging.decode(b"\xff\xd8\xff", "jpeg")


def test_average_hash_deterministic():
    arr = _rand_img(5)
    assert imaging.average_hash(arr) == imaging.average_hash(arr.copy())
    assert -(2**63) <= imaging.average_hash(arr) < 2**63


def test_fixture_deterministic_and_invariants():
    a = fixtures.make_fixture(n_entities=40)
    b = fixtures.make_fixture(n_entities=40)
    pd.testing.assert_frame_equal(a.drop(columns=["bytes"]), b.drop(columns=["bytes"]))
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    # (image_id, ts) unique
    assert not a.duplicated(["image_id", "ts"]).any()
    # pixel ground truth re-derivable: decode == pixel_array
    row = a.iloc[0]
    arr = fixtures.pixel_array(row.image_id, 0, row.w, row.h)
    back = imaging.decode(row.bytes, row.fmt)
    np.testing.assert_array_equal(arr, back)
    # caption round-trip is byte-exact by construction
    assert a["caption"].map(lambda s: isinstance(s, str)).all()


def test_fixture_skew_shape():
    pdf = fixtures.make_fixture(n_entities=100, with_images=False)
    counts = pdf.groupby("phash").size()
    top = counts.max() / len(pdf)
    assert top > 0.15, f"hot phash cluster only {top:.0%} of rows"


def test_truncated_ppm_comment_raises_not_hangs():
    """An unterminated header comment must raise like any other corruption
    — the unbounded scan loop used to spin forever and wedge the task."""
    import pytest
    with pytest.raises(ValueError, match="truncated PPM header comment"):
        imaging.decode_ppm(b"P6 #abc")


def test_null_bytes_map_to_decode_failure():
    from profet_spark.functions.image_descriptors import compute_image_stats
    stats = compute_image_stats(None, "png")
    assert stats["decode_ok"] is False
