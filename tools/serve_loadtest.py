"""Serving load test through the real HTTP path (VERDICT r4 #5).

Starts `python -m resshift_tpu.serve` as a subprocess on the real chip
and drives it with concurrent HTTP bursts (requests >> max_batch),
measuring what a client actually sees — PNG decode + queue + batch +
sampler + PNG encode:

  * sustained throughput (Mpx/s of delivered SR pixels) under a closed-
    loop concurrent burst at the operating point (64x64 tiles, realsr_v3);
  * client-side p50/p99 end-to-end latency;
  * overload behavior: a burst beyond max_queue must fast-fail with
    HTTP 429 + Retry-After (bounded memory), never hang;
  * /metrics consistency (served counts, batch histogram).

Results land in PERF.md ("serving, measured through HTTP") and the README
serving-SLA paragraph.

Usage: python tools/serve_loadtest.py [--task realsr_v3] [--port 18080]
       (needs the TPU; ~4 min incl. warmup compile)
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import http.client
import io
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _png(hw: int, seed: int) -> bytes:
    import cv2

    img = (np.random.default_rng(seed).random((hw, hw, 3)) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".png", img)
    assert ok
    return enc.tobytes()


def _post(port: int, body: bytes, timeout: float = 600.0):
    t0 = time.perf_counter()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("POST", "/restore", body=body,
                     headers={"Content-Length": str(len(body))})
        resp = conn.getresponse()
        data = resp.read()
        return {"code": resp.status, "bytes": len(data),
                "retry_after": resp.getheader("Retry-After"),
                "lat_s": time.perf_counter() - t0}
    finally:
        conn.close()


def _get_json(port: int, path: str):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    try:
        conn.request("GET", path)
        return json.loads(conn.getresponse().read())
    finally:
        conn.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="realsr_v3")
    ap.add_argument("--port", type=int, default=18080)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--burst", type=int, default=96)
    ap.add_argument("--threads", type=int, default=32)
    ap.add_argument("--max-queue", type=int, default=24)
    ap.add_argument("--overload", type=int, default=120,
                    help="single-shot burst size for the 429 check")
    args = ap.parse_args()

    srv = subprocess.Popen(
        [sys.executable, "-m", "resshift_tpu.serve", "--task", args.task,
         "--host", "127.0.0.1", "--port", str(args.port),
         "--warmup", f"{args.hw}x{args.hw}",
         "--max-queue", str(args.max_queue)],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
        env={**os.environ},
    )
    report = {"task": args.task, "hw": args.hw, "burst": args.burst,
              "threads": args.threads, "max_queue": args.max_queue}
    try:
        # wait for warmup (first big-jit compile ~3 min through the relay)
        deadline = time.time() + 900
        while time.time() < deadline:
            try:
                _get_json(args.port, "/health")
                break
            except Exception:
                if srv.poll() is not None:
                    raise RuntimeError("server died during startup")
                time.sleep(2)
        else:
            raise RuntimeError("server did not come up in 900 s")
        # one request to confirm the warmed program serves
        body = _png(args.hw, 0)
        first = _post(args.port, body)
        assert first["code"] == 200, first
        print(f"[loadtest] first request: {first['lat_s']*1e3:.0f} ms "
              f"(incl. any residual compile)", flush=True)

        # ---- closed-loop concurrent burst (steady-state throughput) ----
        bodies = [_png(args.hw, i) for i in range(args.threads)]
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(args.threads) as ex:
            results = list(ex.map(
                lambda i: _post(args.port, bodies[i % args.threads]),
                range(args.burst)))
        wall = time.perf_counter() - t0
        ok = [r for r in results if r["code"] == 200]
        lat = sorted(r["lat_s"] for r in ok)
        px = len(ok) * (args.hw * 4) ** 2  # sf=4 output pixels
        report["burst_results"] = {
            "ok": len(ok),
            "codes": {c: sum(1 for r in results if r["code"] == c)
                      for c in sorted({r["code"] for r in results})},
            "wall_s": round(wall, 2),
            "mpx_per_s": round(px / wall / 1e6, 3),
            "p50_ms": round(lat[len(lat) // 2] * 1e3, 1),
            "p90_ms": round(lat[int(0.9 * (len(lat) - 1))] * 1e3, 1),
            "p99_ms": round(lat[int(0.99 * (len(lat) - 1))] * 1e3, 1),
        }
        print(f"[loadtest] burst {args.burst} reqs x {args.threads} threads: "
              f"{report['burst_results']}", flush=True)

        # ---- overload: single-shot burst >> max_queue -> 429s ----
        with cf.ThreadPoolExecutor(args.overload) as ex:
            results = list(ex.map(
                lambda i: _post(args.port, bodies[i % args.threads]),
                range(args.overload)))
        codes = {c: sum(1 for r in results if r["code"] == c)
                 for c in sorted({r["code"] for r in results})}
        rejected = [r for r in results if r["code"] == 429]
        report["overload"] = {
            "burst": args.overload, "codes": codes,
            "retry_after_set": all(r["retry_after"] for r in rejected),
            "reject_latency_ms_max": round(
                max((r["lat_s"] for r in rejected), default=0.0) * 1e3, 1),
        }
        print(f"[loadtest] overload {args.overload} reqs: {report['overload']}",
              flush=True)

        report["server_metrics"] = _get_json(args.port, "/metrics")
        print(f"[loadtest] /metrics: {json.dumps(report['server_metrics'])[:400]}",
              flush=True)
    finally:
        srv.send_signal(signal.SIGTERM)
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()

    out = Path("/tmp/serve_loadtest.json")
    out.write_text(json.dumps(report, indent=2))
    print(f"[loadtest] -> {out}", flush=True)


if __name__ == "__main__":
    main()
