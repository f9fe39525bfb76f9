"""Command-line interface.

`python -m resshift_tpu.cli infer ...` mirrors the reference's
`inference_resshift.py` surface (task/version/scale/chop/bs/mask/seed) and
`sampler.py ResShiftSampler.inference` semantics: folder or single-file
input, tiled inference over chop_size, inpainting paste-back
`sr*mask + lq*(1-mask)` (sampler.py:219-222), Y-channel PSNR/SSIM report
when a GT folder is given.

Checkpoints: this environment has no network egress, so `--ckpt`/
`--vqgan-ckpt` must point at local .pth (torch) or .npz/orbax (native)
files; the release URLs are printed for out-of-band download.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

# allow the host CPU backend alongside an accelerator-only platform setting
# (cheap param init / preprocessing on host; jax is imported lazily below)
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"


def _build_pipeline(args):
    import jax.numpy as jnp

    from .config import CKPT_URLS, default_chop, load_yaml_config, task_config
    from .pipeline import ResShiftPipeline

    if args.config:
        cfg = load_yaml_config(args.config)
    else:
        name = args.task if args.task != "realsr" else f"realsr_{args.version}"
        if args.task == "realsr" and args.scale == 2:
            name = "realsr_x2"
        cfg = task_config(name)
    if args.chop_size:
        cs, st = default_chop(args.chop_size, cfg["sf"])
        cfg["inference"]["chop_size"] = cs
        cfg["inference"]["chop_stride"] = args.chop_stride * (4 // cfg["sf"]) if args.chop_stride else st
    pipe = ResShiftPipeline(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                            quant_vqgan=getattr(args, "quant_vqgan", None))
    return pipe


def _load_params(pipe, args):
    import jax

    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            return pipe.load_torch_checkpoints(args.ckpt, args.vqgan_ckpt)
        from .checkpoint import load_params

        return load_params(args.ckpt)
    from .config import CKPT_URLS

    name = args.task if args.task != "realsr" else f"realsr_{args.version}"
    urls = CKPT_URLS.get(name)
    if urls:
        # auto-fetch like the reference (inference_resshift.py:125-139) when
        # the environment has egress / the user opted in
        try:
            from .utils.download import load_file_from_url

            up = load_file_from_url(urls[0])
            vp = load_file_from_url(urls[1])
            print(f"Using downloaded checkpoints: {up}, {vp}", file=sys.stderr)
            return pipe.load_torch_checkpoints(str(up), str(vp))
        except FileNotFoundError:
            pass
    print(f"WARNING: no --ckpt given; using RANDOM weights (demo/benchmark only).\n"
          f"Download the released checkpoints out-of-band:\n  unet:  {urls[0] if urls else '?'}\n"
          f"  vqgan: {urls[1] if urls else '?'}", file=sys.stderr)
    # init on host CPU: random weights only need to exist; compiling the
    # initializers for the accelerator wastes minutes of remote-compile
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.devices()[0].platform != "cpu":
        with jax.default_device(cpu):
            params = pipe.init_params(jax.random.PRNGKey(args.seed))
        return jax.device_put(params, jax.devices()[0])
    return pipe.init_params(jax.random.PRNGKey(args.seed))


def cmd_infer(args):
    import jax

    from .parallel.mesh import make_mesh
    from .utils.image_io import from_model, imread, imwrite, list_images, to_model

    pipe = _build_pipeline(args)
    params = _load_params(pipe, args)
    key = jax.random.PRNGKey(args.seed)

    in_path = Path(args.in_path)
    out_path = Path(args.out_path)
    out_path.mkdir(parents=True, exist_ok=True)
    files = list_images(in_path) if in_path.is_dir() else [in_path]
    # multi-process folder sharding (replaces the reference's per-rank batch
    # slicing, sampler.py:273-283)
    files = files[jax.process_index()::jax.process_count()]
    print(f"Found {len(files)} image(s) in {in_path} "
          f"(process {jax.process_index()}/{jax.process_count()})")

    mask_files = None
    if args.mask_path:
        mp = Path(args.mask_path)
        mask_files = {f.stem: f for f in (list_images(mp) if mp.is_dir() else [mp])}

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    bs = max(1, args.bs)

    # group same-shape images into batches of `bs` so each forward runs a
    # full batch (reference: DataLoader(bs), sampler.py:267-283)
    def batches():
        pend: dict[tuple, list] = {}
        for f in files:
            im = imread(f)
            sh = im.shape
            pend.setdefault(sh, []).append((f, im))
            if len(pend[sh]) == bs:
                yield pend.pop(sh)
        yield from pend.values()

    # Pipelined loop: a reader thread prepares batches ahead of dispatch and
    # a writer thread forces + PNG-encodes results, so host I/O overlaps the
    # device compute (utils/io_pipeline.py; the reference loop is serial,
    # sampler.py:267-291).
    from .utils.io_pipeline import AsyncWriter, prefetch

    state = {"px": 0, "done": 0}
    t_start = time.perf_counter()
    lock = threading.Lock()
    n_done = 0
    with AsyncWriter(depth=2) as writer:
        for group in prefetch(batches(), depth=2):
            ims = [im for _, im in group]
            lq = np.concatenate([to_model(im) for im in ims], axis=0)
            mask = None
            if mask_files is not None:
                ms = []
                for f, _ in group:
                    mf = mask_files.get(f.stem) or next(iter(mask_files.values()))
                    ms.append(to_model(imread(mf, chn="gray")))
                mask = np.concatenate(ms, axis=0)
            k = jax.random.fold_in(key, n_done)
            if getattr(args, "tensor_parallel", False) and n_dev > 1:
                # model weights sharded over all local chips (parallel/tp.py):
                # batch-1 latency scaling — every chip computes a channel/head
                # shard of each layer, collectives on ICI; over-chop inputs
                # run their tile grid through the same TP mesh
                from jax.sharding import Mesh

                tp_mesh = Mesh(np.array(jax.devices()), ("model",))
                sr = pipe.sample_tp(
                    params, jax.numpy.asarray(lq), k, tp_mesh,
                    mask=None if mask is None else jax.numpy.asarray(mask),
                    noise_repeat=args.noise_repeat)
            elif getattr(args, "spatial_parallel", False) and n_dev > 1:
                # the image HEIGHT axis sharded over all local chips
                # (pipeline.sample_spatial): the UNCHOPPED sampler runs as
                # one GSPMD program, XLA halo-exchanges conv borders on ICI
                # — seam-exact large-image mode (no tile blending)
                from jax.sharding import Mesh

                sp_mesh = Mesh(np.array(jax.devices()), ("space",))
                sr = pipe.sample_spatial(
                    params, jax.numpy.asarray(lq), k, sp_mesh,
                    mask=None if mask is None else jax.numpy.asarray(mask),
                    noise_repeat=args.noise_repeat)
            elif getattr(args, "pipeline_parallel", False) and n_dev > 1:
                # the reverse chain staged over all local chips
                # (parallel/pp.py): chunks of tiles stream stage-to-stage
                # over ICI; encode on stage 0, decode on the last stage
                from jax.sharding import Mesh

                pp_mesh = Mesh(np.array(jax.devices()), ("stage",))
                sr = pipe.sample_pipelined(
                    params, jax.numpy.asarray(lq), k, pp_mesh,
                    mask=None if mask is None else jax.numpy.asarray(mask),
                    noise_repeat=args.noise_repeat, chunk_bs=args.chop_bs)
            elif args.time_parallel and lq.shape[1] <= pipe.chop_size \
                    and lq.shape[2] <= pipe.chop_size:
                # Picard-parallel reverse chain: the denoiser runs `sweeps`
                # times on a (T*B) batch sharded over the mesh instead of T
                # sequential times (latency mode; approximate below sweeps=T)
                sr = pipe.sample_time_parallel(
                    params, jax.numpy.asarray(lq), k,
                    mask=None if mask is None else jax.numpy.asarray(mask),
                    sweeps=args.time_parallel, mesh=mesh if n_dev > 1 else None)
            elif n_dev > 1 and lq.shape[0] > 1:
                # shard the image batch over the mesh's data axis
                sr = pipe.sample_batch_sharded(params, jax.numpy.asarray(lq), k, mesh,
                                               mask=None if mask is None else jax.numpy.asarray(mask),
                                               noise_repeat=args.noise_repeat,
                                               tile_bs=args.chop_bs)
            elif n_dev > 1 and (lq.shape[1] > pipe.chop_size or lq.shape[2] > pipe.chop_size):
                # single big image: shard its tile grid over the mesh
                sr = pipe.sample_tiles_sharded(params, jax.numpy.asarray(lq), k, mesh,
                                               mask=None if mask is None else jax.numpy.asarray(mask))
            else:
                sr = pipe.sample(params, lq, k, mask=mask,
                                 noise_repeat=args.noise_repeat, tile_bs=args.chop_bs)
            n_done += len(group)

            def write_job(pool, group=group, sr=sr, mask=mask,
                          mask_back=args.mask_back):
                arr = np.asarray(sr)  # blocks until the device finishes this batch

                def write_one(j_f_im):
                    j, (f, im) = j_f_im
                    sr01 = from_model(arr[j:j + 1])[0]
                    if mask is not None and mask_back:
                        m01 = np.asarray(mask)[j] * 0.5 + 0.5
                        sr01 = sr01 * m01 + (im[..., :3] * (1 - m01))
                    imwrite(sr01, out_path / f"{f.stem}.png")

                list(pool.map(write_one, enumerate(group)))
                with lock:
                    state["px"] += arr.shape[0] * arr.shape[1] * arr.shape[2]
                    state["done"] += len(group)
                    done = state["done"]
                print(f"[{done}/{len(files)}] batch of {len(group)}: "
                      f"{arr.shape[2]}x{arr.shape[1]} "
                      f"({time.perf_counter() - t_start:.2f}s elapsed)")

            writer.submit(write_job)
    t_total = time.perf_counter() - t_start

    print(f"Done: {state['px'] / max(t_total, 1e-9) / 1e6:.3f} Mpx/s "
          f"wall (compute + pipelined I/O) -> {out_path}")

    if args.gt_path:
        report_metrics(files, out_path, Path(args.gt_path),
                       lpips_path=getattr(args, "lpips_path", None))


def report_metrics(files, sr_dir: Path, gt_dir: Path, lpips_path=None,
                   extra: dict | None = None):
    """PSNR(Y)/SSIM(Y) [+ LPIPS when weights are given] over saved outputs —
    the reference's eval metrics (utils/util_image.py:17-116,
    trainer.py:914-923).  Also writes `sr_dir/metrics.json` so protocol
    runs leave a machine-readable artifact (`extra` is merged in)."""
    from .ops.metrics import batch_psnr, batch_ssim
    from .utils.image_io import imread, list_images

    lpips_fn = None
    if lpips_path:
        import jax
        import jax.numpy as jnp

        from .models.lpips import LPIPS, convert_lpips

        model = LPIPS()
        if str(lpips_path).endswith(".pth"):
            import torch

            lp = convert_lpips(torch.load(lpips_path, map_location="cpu",
                                          weights_only=True))
        else:
            from .checkpoint import load_params

            lp = load_params(lpips_path)
        lpips_fn = jax.jit(lambda a, b: model.apply({"params": lp}, a, b))

    gts = {f.stem: f for f in list_images(gt_dir)}
    psnr = ssim = lpips_sum = 0.0
    n = 0
    for f in files:
        if f.stem not in gts or not (sr_dir / f"{f.stem}.png").exists():
            continue
        sr = imread(sr_dir / f"{f.stem}.png")[None]
        gt = imread(gts[f.stem])[None]
        psnr += batch_psnr(sr, gt, ycbcr=True)
        ssim += batch_ssim(sr, gt, ycbcr=True)
        if lpips_fn is not None:
            import jax.numpy as jnp

            lpips_sum += float(lpips_fn(jnp.asarray(sr * 2 - 1, jnp.float32),
                                        jnp.asarray(gt * 2 - 1, jnp.float32))[0])
        n += 1
    if n:
        msg = f"PSNR(Y): {psnr / n:.2f} dB  SSIM(Y): {ssim / n:.4f}"
        if lpips_fn is not None:
            msg += f"  LPIPS: {lpips_sum / n:.4f}"
        print(msg + f"  ({n} images)")
        import json

        record = {"n": n, "psnr_y": float(psnr / n), "ssim_y": float(ssim / n)}
        if lpips_fn is not None:
            record["lpips"] = float(lpips_sum / n)
        record.update(extra or {})
        (sr_dir / "metrics.json").write_text(json.dumps(record, indent=2))
        return psnr / n, ssim / n, (lpips_sum / n if lpips_fn else None)
    return None


# README reproduce protocols (reference README.md:132-167): the exact
# chop/stride/bs used for each paper table.
EVAL_PROTOCOLS = {
    "imagenet": dict(chop_size=64, chop_stride=64, bs=64),
    "realset": dict(chop_size=512, chop_stride=448, bs=1),
}


def cmd_eval(args):
    """One-command paper-protocol evaluation (VERDICT #10): run the exact
    README reproduce command for a protocol and report PSNR/SSIM/LPIPS."""
    proto = EVAL_PROTOCOLS[args.protocol]
    args.bs = proto["bs"]
    args.chop_size = None  # set explicitly below (no default_chop rescale)
    args.chop_stride = None
    args.noise_repeat = False
    args.mask_path = None
    args.mask_back = False
    args.chop_bs = args.chop_bs or 1

    # build pipeline with protocol chop values
    import jax.numpy as jnp

    from .config import load_yaml_config, task_config

    if args.config:
        cfg = load_yaml_config(args.config)
    else:
        name = args.task if args.task != "realsr" else f"realsr_{args.version}"
        cfg = task_config(name)
    cfg["inference"]["chop_size"] = proto["chop_size"]
    cfg["inference"]["chop_stride"] = proto["chop_stride"]

    from .pipeline import ResShiftPipeline

    pipe = ResShiftPipeline(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    params = _load_params(pipe, args)

    import types

    iargs = types.SimpleNamespace(**vars(args))
    iargs.__dict__.update(proto)

    # run folder inference with the protocol settings
    _run_eval_inference(pipe, params, iargs)


def _run_eval_inference(pipe, params, args):
    """Protocol inference (README.md:135-147 reproduce commands), sharded:
    on a multi-chip host the image batch rides the mesh's data axis
    (`sample_batch_sharded`) and a single over-chop image shards its tile
    grid (`sample_tiles_sharded`), exactly like `cmd_infer` — the paper
    protocols must not idle N-1 chips of a v5e-4."""
    import jax

    from .parallel.mesh import make_mesh
    from .utils.image_io import from_model, imread, imwrite, list_images, to_model

    from .utils.io_pipeline import AsyncWriter, prefetch

    in_path, out_path = Path(args.in_path), Path(args.out_path)
    out_path.mkdir(parents=True, exist_ok=True)
    files = list_images(in_path) if in_path.is_dir() else [in_path]
    key = jax.random.PRNGKey(args.seed)
    bs = args.bs
    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    t0 = time.perf_counter()
    done = 0
    counter = {"done": 0}
    lock = threading.Lock()

    def read_batches():
        batch, names = [], []
        for f in files:
            batch.append(to_model(imread(f)))
            names.append(f)
            if len(batch) == bs:
                yield np.concatenate(batch, axis=0), names
                batch, names = [], []
        if batch:
            yield np.concatenate(batch, axis=0), names

    # reads prefetch ahead of dispatch; PNG writes force + encode on a
    # background thread — host I/O rides under the device compute
    with AsyncWriter(depth=2) as writer:
        for lq, names in prefetch(read_batches(), depth=2):
            k = jax.random.fold_in(key, done)
            if n_dev > 1 and lq.shape[0] > 1:
                sr = pipe.sample_batch_sharded(params, jax.numpy.asarray(lq), k, mesh)
            elif n_dev > 1 and (lq.shape[1] > pipe.chop_size
                                or lq.shape[2] > pipe.chop_size):
                sr = pipe.sample_tiles_sharded(params, jax.numpy.asarray(lq), k, mesh)
            else:
                sr = pipe.sample(params, lq, k)
            done += len(names)

            def write_job(pool, sr=sr, names=names):
                arr = np.asarray(sr)
                list(pool.map(
                    lambda jf: imwrite(from_model(arr[jf[0]:jf[0] + 1])[0],
                                       out_path / f"{jf[1].stem}.png"),
                    enumerate(names)))
                with lock:
                    counter["done"] += len(names)
                    print(f"[{counter['done']}/{len(files)}]", flush=True)

            writer.submit(write_job)
    dt = time.perf_counter() - t0
    print(f"Protocol {args.protocol}: {len(files)} images in {dt:.1f}s")
    if args.gt_path:
        report_metrics(files, out_path, Path(args.gt_path),
                       lpips_path=getattr(args, "lpips_path", None),
                       extra={"protocol": args.protocol,
                              "seconds": round(dt, 1)})


def cmd_train(args):
    import jax.numpy as jnp

    from .config import load_yaml_config, task_config
    from .train_loop import Trainer

    cfg = load_yaml_config(args.config) if args.config else task_config(
        args.task if args.task != "realsr" else f"realsr_{args.version}")
    if "data" not in cfg or not cfg["data"].get("train"):
        raise SystemExit("config has no data.train section — provide --config "
                         "with dataset paths")
    # handle_signals: SIGTERM (pod preemption) / SIGINT checkpoint cleanly
    # at the next iteration boundary and exit; resume is bit-identical
    Trainer(cfg, save_dir=args.save_dir, resume=args.resume,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            seed=args.seed).train(handle_signals=True)


def cmd_convert(args):
    """Convert a torch .pth pair into a native orbax checkpoint."""
    from .checkpoint import save_params
    from .pipeline import ResShiftPipeline

    pipe = _build_pipeline(args)
    params = pipe.load_torch_checkpoints(args.ckpt, args.vqgan_ckpt)
    save_params(args.out_path, params)
    print(f"Converted -> {args.out_path}")


def cmd_export_torch(args):
    """Inverse checkpoint conversion: native params (orbax dir, or a .pth
    pair for a roundtrip) -> reference-layout torch `.pth` state_dicts, so
    weights trained on TPU deploy in the torch ecosystem unchanged
    (convert.py export_* — the exact inverse of the forward converter)."""
    from .convert import export_unet_swin, export_vqgan, save_torch_state_dict

    pipe = _build_pipeline(args)
    params = _load_params(pipe, args)
    m = pipe.config["model"]
    sd = export_unet_swin(
        params["unet"],
        image_size=m["image_size"], channel_mult=m["channel_mult"],
        num_res_blocks=m["num_res_blocks"],
        attention_resolutions=m["attention_resolutions"],
        swin_depth=m.get("swin_depth", 2), cond_lq=m.get("cond_lq", True),
        lq_size=m.get("lq_size", 64),
        resblock_updown=m.get("resblock_updown", False),
    )
    save_torch_state_dict(args.out_path, sd)
    print(f"denoiser -> {args.out_path} ({len(sd)} tensors)")
    if args.vqgan_out:
        if "vqgan" not in params:
            raise SystemExit("--vqgan-out given but the checkpoint has no "
                             "vqgan params")
        dd = pipe.config["autoencoder"]["ddconfig"]
        sdv = export_vqgan(
            params["vqgan"],
            ch_mult=dd["ch_mult"], num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=dd.get("attn_resolutions", ()),
            resolution=dd.get("resolution", 256),
        )
        save_torch_state_dict(args.vqgan_out, sdv)
        print(f"vqgan -> {args.vqgan_out} ({len(sdv)} tensors)")


def cmd_export(args):
    """Serialize the jitted sampler to a portable StableHLO artifact
    (export.py) at a fixed operating point — the deployment story the
    reference lacks (predict.py re-builds its sampler per request)."""
    import json as _json

    from .export import export_sampler, save_artifact

    pipe = _build_pipeline(args)
    params = _load_params(pipe, args)
    h, w = (int(v) for v in args.hw.lower().split("x"))
    platforms = args.platforms.split(",") if args.platforms else None
    blob, manifest = export_sampler(pipe, params, (h, w), batch=args.batch,
                                    with_mask=args.with_mask,
                                    platforms=platforms)
    save_artifact(args.out_path, blob, manifest)
    print(_json.dumps(manifest))
    print(f"exported -> {args.out_path} ({len(blob) / 1e6:.1f} MB)")


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="resshift_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--task", default="realsr",
                        choices=["realsr", "bicsr", "inpaint_imagenet", "inpaint_face", "faceir"])
        sp.add_argument("--version", default="v3", choices=["v1", "v2", "v3"])
        sp.add_argument("--scale", type=int, default=4)
        sp.add_argument("--config", default=None, help="custom YAML config")
        sp.add_argument("--ckpt", default=None)
        sp.add_argument("--vqgan-ckpt", default=None)
        sp.add_argument("--seed", type=int, default=12345)
        sp.add_argument("--bf16", action="store_true", default=True)
        sp.add_argument("--fp32", dest="bf16", action="store_false")
        sp.add_argument("--quant-vqgan", default=None, choices=["int8"],
                        help="EXPERIMENTAL int8 conv backbones for the VQGAN "
                             "halves (measured net-negative at the composed "
                             "level — see PERF.md; denoiser stays bf16)")
        sp.add_argument("--distributed", action="store_true",
                        help="force jax.distributed.initialize() (auto-detected "
                             "on TPU pods / when JAX_COORDINATOR_ADDRESS is set)")

    pi = sub.add_parser("infer", help="restore a folder or single image")
    common(pi)
    pi.add_argument("--in-path", required=True)
    pi.add_argument("--out-path", required=True)
    pi.add_argument("--gt-path", default=None, help="GT folder for PSNR/SSIM report")
    pi.add_argument("--lpips-path", default=None, help="LPIPS weights for the metric report")
    pi.add_argument("--mask-path", default=None, help="inpainting mask (file or folder)")
    pi.add_argument("--mask-back", action="store_true", default=True)
    pi.add_argument("--chop-size", type=int, default=None, choices=[512, 256, 64])
    pi.add_argument("--chop-stride", type=int, default=None)
    pi.add_argument("--chop-bs", type=int, default=1)
    pi.add_argument("--bs", type=int, default=1)
    pi.add_argument("--noise-repeat", action="store_true")
    pi.add_argument("--time-parallel", type=int, default=0, metavar="SWEEPS",
                    help="Picard-parallel sampling with this many sweeps "
                         "(latency mode; sweeps = steps is exact)")
    pi.add_argument("--tensor-parallel", action="store_true",
                    help="shard the model over all local chips "
                         "(parallel/tp.py; exact — batch-1 latency mode for "
                         "single-tile inputs)")
    pi.add_argument("--spatial-parallel", action="store_true",
                    help="shard the image HEIGHT axis over all local chips "
                         "(pipeline.sample_spatial; exact — the unchopped "
                         "sampler runs as one GSPMD program with conv-border "
                         "halo exchanges on ICI: no tile seams, 1/n of every "
                         "activation per chip)")
    pi.add_argument("--pipeline-parallel", action="store_true",
                    help="stage the reverse-diffusion chain over all local "
                         "chips (parallel/pp.py GPipe streaming; exact — "
                         "each chip runs its slice of the chain, chunks of "
                         "--chop-bs tiles flow stage-to-stage over ICI)")
    pi.set_defaults(fn=cmd_infer)

    pe = sub.add_parser("eval", help="README reproduce protocols "
                        "(imagenet: chop64/stride64/bs64; realset: chop512/stride448)")
    common(pe)
    pe.add_argument("--protocol", required=True, choices=sorted(EVAL_PROTOCOLS))
    pe.add_argument("--in-path", required=True)
    pe.add_argument("--out-path", required=True)
    pe.add_argument("--gt-path", default=None)
    pe.add_argument("--lpips-path", default=None)
    pe.add_argument("--chop-bs", type=int, default=1)
    pe.set_defaults(fn=cmd_eval)

    pc = sub.add_parser("convert", help="torch .pth -> native checkpoint")
    common(pc)
    pc.add_argument("--out-path", required=True)
    pc.set_defaults(fn=cmd_convert)

    pxt = sub.add_parser("export-torch", help="native checkpoint -> reference-"
                         "layout torch .pth (deploy TPU-trained weights in "
                         "the torch ecosystem)")
    common(pxt)
    pxt.add_argument("--out-path", required=True, help="denoiser .pth path")
    pxt.add_argument("--vqgan-out", default=None, help="also export the VQGAN "
                     "params to this .pth path")
    pxt.set_defaults(fn=cmd_export_torch, chop_size=None, chop_stride=None)

    pt = sub.add_parser("train", help="train a task (main.py equivalent)")
    common(pt)
    pt.add_argument("--save-dir", default="./save_dir")
    pt.add_argument("--resume", default=None)
    pt.set_defaults(fn=cmd_train)

    px = sub.add_parser("export", help="serialize the sampler to a portable "
                        "StableHLO artifact (AOT deployment)")
    common(px)
    px.add_argument("--out-path", required=True)
    px.add_argument("--hw", default="64x64", metavar="HxW",
                    help="LQ input size the artifact is specialized for")
    px.add_argument("--batch", type=int, default=1)
    px.add_argument("--with-mask", action="store_true",
                    help="export the inpainting signature (lq + mask)")
    px.add_argument("--platforms", default=None,
                    help="comma list (e.g. tpu,cpu); default: current backend")
    px.set_defaults(fn=cmd_export, chop_size=None, chop_stride=None)
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    # multi-host bootstrap BEFORE any jax device use (torchrun equivalent);
    # no-op on a single host unless --distributed forces it
    from .parallel.mesh import maybe_init_distributed
    from .utils.compile_cache import enable_compile_cache

    maybe_init_distributed(force=getattr(args, "distributed", False))
    enable_compile_cache()  # reuse sampler compilations across CLI restarts
    args.fn(args)


if __name__ == "__main__":
    main()
