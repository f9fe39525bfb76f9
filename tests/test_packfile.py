"""PackFile native IO runtime: format roundtrip, native-vs-Python reader
equality, FileClient backend, and dataset integration (the reference's
FileClient lmdb role — basicsr/utils/file_client.py:5-131)."""

import numpy as np
import pytest

from resshift_tpu.data.packfile import (PackReader, PackWriter, _PyReader,
                                        native_available)

TD = "/root/reference/testdata"


def _make_pack(tmp_path, n=5):
    blobs = {f"key_{i:03d}": bytes([i]) * (10 + 7 * i) for i in range(n)}
    blobs["zzz/last.png"] = b"lastblob"
    blobs["aaa/first"] = b""  # empty blob is legal
    path = tmp_path / "data.pack"
    with PackWriter(path) as w:
        for k in sorted(blobs, reverse=True):  # insertion order irrelevant
            w.add(k, blobs[k])
    return path, blobs


def test_roundtrip_python_reader(tmp_path):
    path, blobs = _make_pack(tmp_path)
    r = PackReader(path, native=False)
    assert len(r) == len(blobs)
    assert sorted(r.keys()) == sorted(blobs)
    for k, v in blobs.items():
        assert r.get(k) == v
    with pytest.raises(KeyError):
        r.get("missing")
    r.close()


def test_native_reader_matches_python(tmp_path):
    if not native_available():
        pytest.skip("no C++ toolchain")
    path, blobs = _make_pack(tmp_path, n=64)
    rn = PackReader(path, native=True)
    assert rn.native
    rp = PackReader(path, native=False)
    assert len(rn) == len(rp)
    for i in range(len(rp)):
        assert rn.key(i) == rp.key(i)
        assert rn.get_index(i) == rp.get_index(i)
    for k in blobs:
        assert rn.get(k) == blobs[k]
    assert rn.impl.find("nope") == -1
    rn.prefetch(0)  # no-crash
    rn.close()
    rp.close()


def test_file_client_pack_imread(tmp_path):
    import cv2

    from resshift_tpu.data.file_client import FileClient

    im = np.random.default_rng(0).integers(0, 255, (24, 16, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", im)
    assert ok
    path = tmp_path / "ims.pack"
    with PackWriter(path) as w:
        w.add("a.png", buf.tobytes())
    fc = FileClient("pack", path)
    got = fc.imread("a.png", dtype="uint8")
    # imdecode(BGR)->RGB of a PNG roundtrip is lossless
    np.testing.assert_array_equal(got, cv2.cvtColor(im, cv2.COLOR_BGR2RGB))
    with pytest.raises(ValueError):
        FileClient("memcached")


def test_base_dataset_from_pack(tmp_path):
    import cv2

    from resshift_tpu.data.datasets import create_dataset
    from resshift_tpu.scripts import pack_folder

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        cv2.imwrite(str(src / f"im{i}.png"),
                    rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
    n = pack_folder(str(src), str(tmp_path / "imgs.pack"))
    assert n == 3

    ds = create_dataset(dict(type="base", params=dict(
        pack_path=str(tmp_path / "imgs.pack"), need_path=True)))
    assert len(ds) == 3
    item = ds[0]
    assert item["lq"].shape == (16, 16, 3)
    assert item["path"].endswith(".png")
    # values match the disk dataset
    ds_disk = create_dataset(dict(type="base", params=dict(dir_path=str(src))))
    np.testing.assert_allclose(ds[1]["lq"], ds_disk[1]["lq"], atol=1e-6)


def test_realesrgan_dataset_from_pack(tmp_path):
    import cv2

    from resshift_tpu.data.datasets import create_dataset
    from resshift_tpu.scripts import pack_folder

    src = tmp_path / "gt"
    src.mkdir()
    rng = np.random.default_rng(2)
    for i in range(2):
        cv2.imwrite(str(src / f"g{i}.png"),
                    rng.integers(0, 255, (80, 80, 3), dtype=np.uint8))
    pack_folder(str(src), str(tmp_path / "gt.pack"))
    ds = create_dataset(dict(type="realesrgan", params=dict(
        pack_path=str(tmp_path / "gt.pack"), gt_size=64, rescale_gt=True)))
    item = ds[0]
    assert item["gt"].shape[-1] == 3
    assert "kernel1" in item and "kernel2" in item
