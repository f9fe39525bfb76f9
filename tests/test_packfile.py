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
        FileClient("lmdb")


class _FakeMemcached:
    """In-process memcached daemon speaking the ASCII protocol (get/set),
    with a configurable item-size limit — enough to exercise the client
    without a real daemon."""

    def __init__(self, max_item=1 << 20):
        import socketserver
        import threading

        store, limit = {}, max_item

        class H(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    parts = line.strip().split()
                    if not parts:
                        continue
                    if parts[0] == b"get":
                        for k in parts[1:]:
                            if k in store:
                                v = store[k]
                                self.wfile.write(
                                    b"VALUE %s 0 %d\r\n%s\r\n" % (k, len(v), v))
                        self.wfile.write(b"END\r\n")
                    elif parts[0] == b"set":
                        n = int(parts[4])
                        data = self.rfile.read(n + 2)[:-2]
                        if n > limit:
                            self.wfile.write(
                                b"SERVER_ERROR object too large for cache\r\n")
                        else:
                            store[parts[1]] = data
                            self.wfile.write(b"STORED\r\n")
                    else:
                        self.wfile.write(b"ERROR\r\n")

        self.store = store
        self.srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), H)
        self.srv.daemon_threads = True
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    @property
    def server(self):
        return "127.0.0.1:%d" % self.srv.server_address[1]

    def close(self):
        self.srv.shutdown()
        self.srv.server_close()


def test_memcached_client_roundtrip():
    from resshift_tpu.data.memcached import MemcachedClient, sanitize_key

    d = _FakeMemcached(max_item=64)
    try:
        c = MemcachedClient(d.server)
        assert c.get("absent") is None
        assert c.set("k", b"hello") is True
        assert c.get("k") == b"hello"
        assert c.set("big", b"x" * 100) is False        # over the item limit
        assert c.get("big") is None
        # illegal keys (spaces / >250 bytes) are hashed, still roundtrip
        long_key = "dir with spaces/" + "p" * 300
        assert sanitize_key(long_key).startswith("sha256:")
        assert c.set(long_key, b"v2") is True
        assert c.get(long_key) == b"v2"
        c.close()
    finally:
        d.close()


def test_memcached_client_dead_server_is_a_miss():
    from resshift_tpu.data.memcached import MemcachedClient

    d = _FakeMemcached()
    server = d.server
    d.close()  # nothing listening anymore
    c = MemcachedClient(server, timeout=0.2)
    assert c.get("k") is None
    assert c.set("k", b"v") is False


def test_base_dataset_io_backend_memcached(tmp_path):
    import copy

    import cv2

    from resshift_tpu.data.datasets import create_dataset

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        cv2.imwrite(str(src / f"im{i}.png"),
                    rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
    d = _FakeMemcached()
    try:
        ds = create_dataset(dict(type="base", params=dict(
            dir_path=str(src),
            io_backend=dict(type="memcached", server=d.server))))
        item = ds[0]
        assert item["lq"].shape == (16, 16, 3)
        assert len(d.store) == 1                         # populated on read
        # DataLoader workers deepcopy the dataset — must survive a live socket
        ds2 = copy.deepcopy(ds)
        np.testing.assert_allclose(ds2[0]["lq"], item["lq"])
        ds_disk = create_dataset(dict(type="base", params=dict(dir_path=str(src))))
        np.testing.assert_allclose(ds[1]["lq"], ds_disk[1]["lq"], atol=1e-6)
    finally:
        d.close()


def test_file_client_memcached_read_through(tmp_path):
    from resshift_tpu.data.file_client import FileClient

    f = tmp_path / "blob.bin"
    f.write_bytes(b"\x01\x02disk-bytes")
    d = _FakeMemcached()
    try:
        fc = FileClient("memcached", server=d.server)
        assert fc.get(f) == b"\x01\x02disk-bytes"       # miss -> disk
        assert len(d.store) == 1                         # ...and populated
        f.write_bytes(b"changed-on-disk")
        assert fc.get(f) == b"\x01\x02disk-bytes"       # now served by cache
        fc.cache.close()
    finally:
        d.close()


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
