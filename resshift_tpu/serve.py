"""Serving: programmatic Predictor + a stdlib HTTP endpoint.

Capability parity with the reference's serving layer:
  * `Predictor` mirrors the Cog wrapper (predict.py:11-80): one-time model
    setup, per-request restore of a single image, optional task switching.
  * `serve()` replaces the Gradio demo (app.py): POST an image, get the
    restored PNG back.  Pure stdlib (this image has no gradio/cog), so it
    deploys anywhere:

      python -m resshift_tpu.serve --task realsr_v3 --port 8080
      curl -X POST --data-binary @lq.png localhost:8080/restore > sr.png
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class Predictor:
    """predict.py-equivalent: setup() once, predict() per request."""

    def __init__(self, task: str = "realsr_v3", ckpt: str | None = None,
                 vqgan_ckpt: str | None = None, seed: int = 12345, bf16: bool = True,
                 chop_bs: int = 1):
        import jax
        import jax.numpy as jnp

        from .pipeline import ResShiftPipeline

        self.pipe = ResShiftPipeline(task, dtype=jnp.bfloat16 if bf16 else jnp.float32)
        if ckpt and ckpt.endswith(".pth"):
            self.params = self.pipe.load_torch_checkpoints(ckpt, vqgan_ckpt)
        elif ckpt:
            from .checkpoint import load_params

            self.params = load_params(ckpt)
        else:
            print("WARNING: serving with RANDOM weights (no --ckpt)", file=sys.stderr)
            self.params = self.pipe.init_params(jax.random.PRNGKey(0))
        self._key = __import__("jax").random.PRNGKey(seed)
        self._count = 0
        # tiles per forward when chopping big images; 128 is the measured
        # single-chip serving sweet spot (PERF.md tile-batch sweep)
        self.chop_bs = chop_bs

    def predict(self, image: np.ndarray, mask: np.ndarray | None = None) -> np.ndarray:
        """image: HWC RGB uint8 or [0,1] float -> restored HWC [0,1] float."""
        import jax

        from .utils.image_io import from_model, to_model

        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        lq = to_model(image)
        m = to_model(mask) if mask is not None else None
        self._count += 1
        out = self.pipe.sample(self.params, lq, jax.random.fold_in(self._key, self._count),
                               mask=m, tile_bs=self.chop_bs)
        sr = from_model(np.asarray(out))[0]
        if m is not None:
            m01 = np.asarray(m)[0] * 0.5 + 0.5
            sr = sr * m01 + image[..., :3] * (1 - m01)
        return sr


_DEMO_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>ResShift-TPU demo</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:880px;margin:2rem auto;padding:0 1rem}
 .row{display:flex;gap:1rem;flex-wrap:wrap}
 .row>div{flex:1;min-width:300px}
 img{max-width:100%%;border:1px solid #ccc;border-radius:4px}
 button{padding:.5rem 1.2rem;font-size:1rem;cursor:pointer}
 #status{color:#666;margin-left:1rem}
</style></head><body>
<h2>ResShift-TPU &mdash; image restoration (task: %(task)s)</h2>
<p>Upload a low-quality image; the server runs the full diffusion sampler
on TPU and returns the restored result.</p>
<p><input type="file" id="file" accept="image/*">
   <button id="go" disabled>Restore</button><span id="status"></span></p>
<div class="row">
 <div><h4>Input</h4><img id="in"></div>
 <div><h4>Output</h4><img id="out"></div>
</div>
<script>
const f=document.getElementById('file'),go=document.getElementById('go'),
      st=document.getElementById('status');
let data=null;
f.onchange=()=>{const r=new FileReader();
  r.onload=()=>{data=r.result;document.getElementById('in').src=
    URL.createObjectURL(f.files[0]);go.disabled=false;};
  r.readAsArrayBuffer(f.files[0]);};
go.onclick=async()=>{go.disabled=true;st.textContent='running\\u2026';
  try{const t0=performance.now();
    const resp=await fetch('/restore',{method:'POST',body:data});
    if(!resp.ok)throw new Error(await resp.text());
    const blob=await resp.blob();
    document.getElementById('out').src=URL.createObjectURL(blob);
    st.textContent=((performance.now()-t0)/1000).toFixed(1)+' s';
  }catch(e){st.textContent='error: '+e.message;}
  go.disabled=false;};
</script></body></html>"""


class _Handler(BaseHTTPRequestHandler):
    predictor: Predictor = None  # set by serve()
    task: str = "?"

    def do_GET(self):
        if self.path == "/health":
            body = json.dumps({"status": "ok"}).encode()
            ctype = "application/json"
        elif self.path in ("/", "/index.html"):
            # browser demo page — the reference's Gradio app (app.py) without
            # the gradio dependency
            body = (_DEMO_PAGE % {"task": self.task}).encode()
            ctype = "text/html; charset=utf-8"
        else:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if not self.path.startswith("/restore"):
            self.send_error(404)
            return
        try:
            import cv2

            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                raise ValueError("cannot decode image body")
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            t0 = time.perf_counter()
            sr = self.predictor.predict(img)
            dt = time.perf_counter() - t0
            sr8 = cv2.cvtColor((sr * 255).round().astype(np.uint8), cv2.COLOR_RGB2BGR)
            ok, enc = cv2.imencode(".png", sr8)
            body = enc.tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Inference-Seconds", f"{dt:.3f}")
            self.end_headers()
            self.wfile.write(body)
        except Exception as e:  # noqa: BLE001
            msg = json.dumps({"error": str(e)}).encode()
            self.send_response(500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(msg)))
            self.end_headers()
            self.wfile.write(msg)

    def log_message(self, fmt, *args):
        print(f"[serve] {fmt % args}", file=sys.stderr)


def serve(task: str = "realsr_v3", ckpt: str | None = None, vqgan_ckpt: str | None = None,
          host: str = "0.0.0.0", port: int = 8080, chop_bs: int = 1):
    _Handler.predictor = Predictor(task, ckpt, vqgan_ckpt, chop_bs=chop_bs)
    _Handler.task = task
    httpd = ThreadingHTTPServer((host, port), _Handler)
    print(f"[serve] {task} listening on {host}:{port} (browser demo at /)",
          file=sys.stderr)
    httpd.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(prog="resshift_tpu.serve")
    p.add_argument("--task", default="realsr_v3")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--vqgan-ckpt", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--chop-bs", type=int, default=1,
                   help="tiles per forward when chopping large inputs "
                        "(128 = measured single-chip sweet spot)")
    a = p.parse_args(argv)
    serve(a.task, a.ckpt, a.vqgan_ckpt, a.host, a.port, a.chop_bs)


if __name__ == "__main__":
    main()
