"""Native C++ loader tests: builds the .so, decodes real JPEGs, checks
correctness vs the Python (PIL) path."""

import os.path as osp
import numpy as np
import pytest
from PIL import Image

from robustart_tpu.data.native_loader import NativeDataLoader, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader toolchain unavailable"
)


@pytest.fixture(scope="module")
def jpeg_set(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths, labels = [], []
    for i in range(10):
        arr = rng.integers(0, 255, (300 + 10 * i, 260, 3), np.uint8)
        p = d / f"im_{i}.jpg"
        Image.fromarray(arr).save(p, "JPEG", quality=95)
        paths.append(str(p))
        labels.append(i % 3)
    return paths, np.array(labels)


def test_native_loader_batches(jpeg_set):
    paths, labels = jpeg_set
    loader = NativeDataLoader(
        paths, labels, np.arange(10), batch_size=4, input_size=224,
        test_resize=256, mode="onecrop", num_threads=4,
    )
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    total = 0
    seen = []
    for b in batches:
        assert b.image.shape == (4, 224, 224, 3)
        assert b.image.dtype == np.uint8
        total += int(b.mask.sum())
        seen += b.index[b.mask].tolist()
        # decoded content should be non-trivial
        assert b.image[b.mask].std() > 10
        # labels match the dataset indices
        for lab, gi in zip(b.label[b.mask], b.index[b.mask]):
            assert lab == labels[gi]
    assert total == 10
    assert sorted(seen) == list(range(10))


def test_native_matches_python_decode_closely(jpeg_set):
    paths, labels = jpeg_set
    loader = NativeDataLoader(
        paths[:1], labels[:1], np.array([0]), batch_size=1,
        input_size=224, test_resize=256, mode="onecrop", num_threads=1,
    )
    native = next(iter(loader)).image[0]

    # PIL reference: decode + resize shorter side 256 (bilinear) + center crop
    with Image.open(paths[0]) as img:
        img = img.convert("RGB")
        w, h = img.size
        if w <= h:
            ow, oh = 256, int(256 * h / w)
        else:
            oh, ow = 256, int(256 * w / h)
        img = img.resize((ow, oh), Image.BILINEAR)
        left, top = (ow - 224) // 2, (oh - 224) // 2
        ref = np.asarray(img.crop((left, top, left + 224, top + 224)))

    # same decode (libjpeg both sides), same tap convention; small rounding
    # differences allowed
    diff = np.abs(native.astype(int) - ref.astype(int))
    assert diff.mean() < 2.0
    assert (diff <= 16).mean() > 0.99


def test_native_loader_shard(jpeg_set):
    paths, labels = jpeg_set
    seen = []
    for rank in range(2):
        idx = np.arange(rank, 10, 2)
        loader = NativeDataLoader(
            paths, labels, idx, batch_size=4, input_size=64, mode="plain"
        )
        for b in loader:
            seen += b.index[b.mask].tolist()
    assert sorted(seen) == list(range(10))


def test_dct_scaled_decode_close(jpeg_set):
    """dct_scale=True (DCT-domain scaled decode, the DALI-style fast path)
    stays within a few grey levels of the exact decode on photo-like
    content (smooth image; random noise is out of scope for resampling
    equivalence)."""
    import numpy as _np
    from PIL import Image as _Image

    d = osp.dirname(jpeg_set[0][0]) if False else None
    del d
    import tempfile

    tmp = tempfile.mkdtemp(prefix="dctjpg_")
    yy, xx = _np.mgrid[0:480, 0:640]
    smooth = _np.stack([
        127 + 90 * _np.sin(xx / 53.0) * _np.cos(yy / 31.0),
        127 + 80 * _np.cos(xx / 91.0 + 1.0),
        127 + 70 * _np.sin((xx + yy) / 71.0),
    ], axis=-1)
    p = osp.join(tmp, "smooth.jpg")
    _Image.fromarray(_np.clip(smooth, 0, 255).astype(_np.uint8)).save(
        p, quality=92
    )

    def run(dct):
        loader = NativeDataLoader(
            [p], _np.zeros(1, _np.int32), _np.array([0]), batch_size=1,
            input_size=224, test_resize=256, mode="onecrop", num_threads=1,
            dct_scale=dct,
        )
        return next(iter(loader)).image[0]

    exact, fast = run(False), run(True)
    diff = _np.abs(exact.astype(int) - fast.astype(int))
    assert diff.mean() < 2.0, diff.mean()
    assert (diff <= 12).mean() > 0.995
