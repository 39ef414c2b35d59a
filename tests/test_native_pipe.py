"""Native C++ image pipeline parity vs the PIL reference path."""
import io

import numpy as np
import pytest

from candidate_reranking_cir_tpu.data import native_pipe
from candidate_reranking_cir_tpu.data.preprocessing import (
    CLIP_STD,
    make_transform,
)

if not native_pipe.native_available():
    pytest.skip("libimagepipe.so not built (make -C native)",
                allow_module_level=True)

PIL_Image = pytest.importorskip("PIL.Image")


def _jpeg_bytes(arr):
    buf = io.BytesIO()
    PIL_Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


@pytest.mark.parametrize("shape", [(347, 272), (90, 308), (64, 64),
                                   (401, 123)])
@pytest.mark.parametrize("kind", ["targetpad", "squarepad"])
def test_parity_with_pil(shape, kind):
    rng = np.random.default_rng(sum(shape))
    arr = rng.integers(0, 255, size=(*shape, 3), dtype=np.uint8)
    data = _jpeg_bytes(arr)

    ref = make_transform(kind, 96, 1.25)(PIL_Image.open(io.BytesIO(data)))
    out = native_pipe.process_jpeg_bytes(data, 96, 1.25,
                                         kind == "squarepad")
    # compare in 8-bit scale: de-normalize the difference
    diff255 = np.abs(out - ref) * CLIP_STD[None, None] * 255
    assert diff255.mean() < 0.5, diff255.mean()
    assert diff255.max() < 10, diff255.max()


def test_rgb_entry_point():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, size=(120, 80, 3), dtype=np.uint8)
    out = native_pipe.process_rgb(arr, dim=64)
    assert out.shape == (64, 64, 3)
    ref = make_transform("targetpad", 64, 1.25)(PIL_Image.fromarray(arr))
    diff255 = np.abs(out - ref) * CLIP_STD[None, None] * 255
    assert diff255.max() < 10  # no jpeg loss on this path, only resampling


def test_decode_failure_raises():
    with pytest.raises(ValueError):
        native_pipe.process_jpeg_bytes(b"not a jpeg", 64)


def test_dataset_uses_path_transform(tmp_path):
    import json

    from candidate_reranking_cir_tpu.data.datasets import CIRRDataset

    base = tmp_path / "cirr_dataset"
    (base / "cirr" / "captions").mkdir(parents=True)
    (base / "cirr" / "image_splits").mkdir(parents=True)
    (base / "img").mkdir()
    arr = np.random.default_rng(0).integers(0, 255, size=(50, 40, 3),
                                            dtype=np.uint8)
    PIL_Image.fromarray(arr).save(base / "img" / "a.jpg", quality=92)
    json.dump([], open(base / "cirr" / "captions" / "cap.rc2.val.json", "w"))
    json.dump({"a": "img/a.jpg"},
              open(base / "cirr" / "image_splits" / "split.rc2.val.json",
                   "w"))

    t = native_pipe.make_native_transform("targetpad", 32, 1.25)
    ds = CIRRDataset(tmp_path, "val", "classic", t)
    sample = ds[0]
    assert sample["image"].shape == (32, 32, 3)
    assert sample["image"].dtype == np.float32


def test_batch_decode_matches_single():
    """Thread-pool batch decode == per-image decode, and failures name the
    bad indices."""
    rng = np.random.default_rng(3)
    datas = []
    for i in range(9):
        arr = rng.integers(0, 255, size=(40 + 7 * i, 30 + 5 * i, 3),
                           dtype=np.uint8)
        buf = io.BytesIO()
        PIL_Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        datas.append(buf.getvalue())

    batch = native_pipe.process_jpeg_batch(datas, dim=64, num_threads=4)
    assert batch.shape == (9, 64, 64, 3)
    for i, d in enumerate(datas):
        single = native_pipe.process_jpeg_bytes(d, dim=64)
        np.testing.assert_array_equal(batch[i], single)

    with pytest.raises(ValueError, match=r"indices \[1\]"):
        native_pipe.process_jpeg_batch([datas[0], b"junk", datas[2]], dim=64)


def test_index_build_uses_native_batch_path(tmp_path):
    """build_index's fast path (batch_from_paths) produces the same features
    and names as the per-item path."""
    import json

    from candidate_reranking_cir_tpu.data.datasets import CIRRDataset
    from candidate_reranking_cir_tpu.data.preprocessing import make_transform
    from candidate_reranking_cir_tpu.retrieval.index import iter_batches

    base = tmp_path / "cirr_dataset"
    (base / "cirr" / "captions").mkdir(parents=True)
    (base / "cirr" / "image_splits").mkdir(parents=True)
    (base / "img").mkdir()
    rng = np.random.default_rng(5)
    relpath = {}
    for i in range(5):
        arr = rng.integers(0, 255, size=(40 + i, 30 + i, 3), dtype=np.uint8)
        PIL_Image.fromarray(arr).save(base / "img" / f"im{i}.jpg", quality=92)
        relpath[f"im{i}"] = f"img/im{i}.jpg"
    with open(base / "cirr" / "image_splits" / "split.rc2.val.json", "w") as f:
        json.dump(relpath, f)
    with open(base / "cirr" / "captions" / "cap.rc2.val.json", "w") as f:
        json.dump([], f)

    nat = native_pipe.make_native_transform("targetpad", 32, 1.25)
    ds_nat = CIRRDataset(tmp_path, "val", "classic", nat)
    ds_item = CIRRDataset(tmp_path, "val", "classic", nat)
    ds_item.transform = native_pipe.make_native_transform("targetpad", 32)
    del ds_item.transform.batch_from_paths  # force the per-item path

    got = list(iter_batches(ds_nat, 2))
    ref = list(iter_batches(ds_item, 2))
    assert [n for ns, _ in got for n in ns] == \
        [n for ns, _ in ref for n in ns]
    np.testing.assert_array_equal(
        np.concatenate([b for _, b in got]),
        np.concatenate([b for _, b in ref]))
