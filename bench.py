#!/usr/bin/env python
"""End-to-end benchmarks: preproc → forward → decode → NMS on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

North star (BASELINE.md): ≥2,000 fps/chip end-to-end at 640px on TPU v5e;
``vs_baseline`` is fps / 2000. (Note: full DyYOLO at 640px carries
~117 GFLOPs/frame, so 2,000 fps exceeds the chip's measured 148 TFLOP/s
bf16 capability — the roofline is ~1,260 fps; we report against the stated
2,000 target regardless.)

Default run: DyYOLO @640 bs=16. ``--config N`` selects the BASELINE.json
workload configs:
  1  BaselineModel, RGB-only, batch 1 @ 640
  2  DyYOLO dual-stream: 8 native-res RGB (1920x1080) + 8 native-res IR
     (640x512) uint8 frames, preprocess_dual alignment fused in-jit,
     NMS included; fps over the 16 frames
  3  DySOEM_SimFPN on IR stream, batch 32 @ 1280
  4  RTMUAVDet full pipeline: preproc + detect + batched NMS (streaming)
  5  RTMUAVDet training loop (fwd+bwd) steps/s
  6  DyYOLO training loop (fwd+bwd+SGD, grad-accum 2, on-device target
     encoding) imgs/s — the reference's actual training workload
"""

import argparse
import json
import sys
import time

import numpy as np


def _timer(run, sync, iters, warmup):
    """Throughput timing with a real device value-fetch sync (axon's
    block_until_ready lies) — delegates to the one shared implementation;
    imported lazily so main() can pin platform/cache before jax loads."""
    from uavdet_tpu.utils.timing import time_total
    return time_total(run, sync, iters, warmup)


def _emit(metric, fps):
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / 2000.0, 3),
    }))


def _detector_bench(name, hparams, batch, input_size, iters, warmup,
                    pre_nms_topk=512, metric_suffix="", microbatch=None,
                    pallas_stem=True):
    """``microbatch``: process the batch in sequential sub-batches (for
    workloads whose activations exceed single-chip HBM, e.g. DySOEM
    b32 @ 1280px needs ~25 GB vs 15.75 GB available)."""
    import jax
    import jax.numpy as jnp
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model

    mb = microbatch or batch
    model = build_model(name, hparams, dtype=jnp.bfloat16)
    # init at batch 1: params are batch-independent, and a full-batch init
    # would run the UNFOLDED forward (cfg3's bs=32 @1280 only fits via the
    # folded-stem inference path)
    x_init = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_init, train=False)
    # fused Pallas stem fast path (silently falls back when the model's
    # layer_config doesn't start with the DyConv 3->32/32->64 stem)
    detect = make_detector(
        model, hparams, input_size, pre_nms_topk=pre_nms_topk,
        pallas_stem_variables=variables if pallas_stem else None)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(mb, input_size, input_size, 3), dtype=np.uint8))

    def run():
        out = None
        for _ in range(batch // mb):
            out = detect(variables, imgs)
        return out

    dt = _timer(run, lambda o: float(jnp.sum(o.scores)), iters, warmup)
    fps = batch * iters / dt
    suffix = metric_suffix + (
        f" (microbatch {mb})" if mb != batch else "")
    _emit(f"fps/chip end-to-end (preproc+detect+NMS) {name} @ "
          f"{input_size}px bs={batch}{suffix}", fps)


def _dual_stream_bench(name, hparams, batch, input_size, iters, warmup,
                       pallas_stem=True):
    """cfg2: native-resolution RGB (1920x1080) + IR (640x512) uint8 frames
    through ``preprocess_dual`` (on-device cross-modality alignment) →
    detector → NMS, ONE jitted program; fps counted over 2B frames
    (the reference feeds modalities as separate samples,
    AntiUAVDataset.py:110-123)."""
    import jax
    import jax.numpy as jnp
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model

    model = build_model(name, hparams, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2 * batch, input_size, input_size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    detect = make_detector(
        model, hparams, input_size, dual=True,
        pallas_stem_variables=variables if pallas_stem else None)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, size=(batch, 1080, 1920, 3),
                                   dtype=np.uint8))
    ir = jnp.asarray(rng.integers(0, 256, size=(batch, 512, 640, 3),
                                  dtype=np.uint8))

    dt = _timer(lambda: detect(variables, rgb, ir),
                lambda o: float(jnp.sum(o.scores)), iters, warmup)
    _emit(f"fps/chip end-to-end (dual-preproc+detect+NMS) {name} @ "
          f"{input_size}px 2x{batch} native-res frames "
          "[cfg2 rgb+ir dual-stream]", 2 * batch * iters / dt)


def _rtm_detector_bench(batch, input_size, iters, warmup, train_loop=False,
                        fold=True):
    """RTMUAVDet pipeline (config 4) / training loop (config 5).

    ``fold``: run the stem + CSP base conv in the parity-folded layout —
    the 32-ch @H/2 stem map, 4x lane-padded, never materializes. For
    detect that is ops/fold_rtm.fold_rtm_front (--no-pallas-stem is the
    A/B switch); for the train loop it is fold_rtm_train_apply
    (masked quadrant-group BN statistics; --no-fold-early is the A/B
    switch and the measured mode is recorded in the metric label)."""
    import jax
    import jax.numpy as jnp
    import optax
    from uavdet_tpu.models.rtm_uav_det import RTMUAVDet, rtm_compute_loss
    from uavdet_tpu.inference import preprocess
    from uavdet_tpu.ops.nms import nms

    det_scales = (input_size // 4, input_size // 8)
    anchors = (((29, 23), (48, 30), (67, 38)),
               ((91, 54), (120, 75), (157, 60)))
    model = RTMUAVDet(anchors=anchors, det_scales=det_scales,
                      dtype=jnp.bfloat16)
    x0 = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x0)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(batch, input_size, input_size, 3), dtype=np.uint8))

    if not train_loop:
        if fold:
            from uavdet_tpu.ops.fold_rtm import fold_rtm_front
            front = fold_rtm_front(variables, dtype=jnp.bfloat16)
            folded_model = RTMUAVDet(anchors=anchors,
                                     det_scales=det_scales,
                                     stem_folded=True, dtype=jnp.bfloat16)

        @jax.jit
        def detect(variables, images):
            if fold:
                # uint8 straight in — the /255 is folded into the kernel
                outs = folded_model.apply(variables, front(images),
                                          train=False)
            else:
                x = preprocess(images, input_size, jnp.bfloat16)
                outs = model.apply(variables, x, train=False)
            boxes, scores = [], []
            for h, o in enumerate(outs):
                stride = input_size // det_scales[h]
                bb = o.bbox.reshape(batch, -1, 4) * stride
                xyxy = jnp.stack(
                    [bb[..., 0] - bb[..., 2] / 2, bb[..., 1] - bb[..., 3] / 2,
                     bb[..., 0] + bb[..., 2] / 2, bb[..., 1] + bb[..., 3] / 2],
                    axis=-1)
                boxes.append(xyxy)
                scores.append(o.obj.reshape(batch, -1))
            bx = jnp.concatenate(boxes, 1)
            sc = jnp.concatenate(scores, 1)

            def per_image(b, s):
                top_s, top_i = jax.lax.top_k(s, 512)
                keep, _, _ = nms(b[top_i], top_s, 0.5, 300)
                return top_s[jnp.maximum(keep, 0)] * (keep >= 0)

            return jax.vmap(per_image)(bx, sc)

        dt = _timer(lambda: detect(variables, imgs),
                    lambda o: float(jnp.sum(o)), 20, warmup)
        _emit(f"fps/chip RTMUAVDet pipeline (preproc+detect+NMS) @ "
              f"{input_size}px bs={batch}", batch * 20 / dt)
        return

    tx = optax.adam(1e-4)
    opt_state = tx.init(variables["params"])
    targets = jnp.asarray(np.tile(
        np.asarray([[100, 100, 200, 200.0]], np.float32), (batch, 1, 1)))

    folded_apply = None
    if fold:
        from uavdet_tpu.ops.fold_rtm import fold_rtm_train_apply
        folded_apply = fold_rtm_train_apply(model)

    @jax.jit
    def step(params, batch_stats, opt_state, images):
        def loss_fn(p):
            x = preprocess(images, input_size, jnp.bfloat16)
            rngs = {"dropout": jax.random.key(0)}
            if folded_apply is not None:
                outs, new_stats = folded_apply(
                    {"params": p, "batch_stats": batch_stats}, x,
                    rngs=rngs)
            else:
                outs, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x,
                    train=True, mutable=["batch_stats"], rngs=rngs)
                new_stats = mut["batch_stats"]
            return rtm_compute_loss(outs, targets, input_size, det_scales), \
                new_stats

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt2, loss

    params, stats = variables["params"], variables["batch_stats"]

    def run():
        nonlocal params, stats, opt_state
        params, stats, opt_state, loss = step(params, stats, opt_state, imgs)
        return loss

    dt = _timer(run, lambda l: float(l), 10, warmup)
    _emit(f"RTMUAVDet train fwd+bwd imgs/s @ {input_size}px bs={batch} "
          f"fold={fold}", batch * 10 / dt)


def _dyyolo_train_bench(cfg, warmup, batch=8, input_size=640,
                        fold_early=True):
    """DyYOLO training step throughput (the reference's workload:
    bs=4 x grad-accum 2, fp16/bf16, SGD momentum — train.py:42-56).

    ``fold_early``: parity-folded early stage in the train step
    (ops/fold_early; the train.trainer.fold_early product knob) —
    lane-dense @H/2 activations, reassociation-level-equal training.
    ``--no-fold-early`` is the A/B switch; the measured mode is recorded
    in the emitted metric label."""
    import jax
    import jax.numpy as jnp
    from uavdet_tpu.models import build_model
    from uavdet_tpu.training import build_optimizer, init_state, \
        make_train_step
    from uavdet_tpu.utils.datatypes import BatchData

    hparams = cfg.model.hparams
    model = build_model(cfg.model.name, hparams, dtype=jnp.bfloat16)
    tx = build_optimizer(hparams, grad_batches=2)
    state = init_state(model, tx, jax.random.key(0), input_size,
                       batch_size=batch)
    step = make_train_step(model, tx, hparams, input_size,
                           compute_dtype=jnp.bfloat16, donate=True,
                           fold_early=fold_early)
    rng = np.random.default_rng(0)
    bd = BatchData(
        image=jnp.asarray(rng.uniform(
            size=(batch, input_size, input_size, 3)).astype(np.float32)),
        boxes=jnp.asarray(np.tile(np.asarray(
            [[0.3, 0.3, 0.6, 0.6]], np.float32), (batch, 1, 1))),
        box_mask=jnp.ones((batch, 1), bool))

    holder = {"state": state}

    def run():
        holder["state"], m = step(holder["state"], bd)
        return m["loss"]

    dt = _timer(run, lambda l: float(l), 10, warmup)
    _emit(f"DyYOLO train fwd+bwd imgs/s @ {input_size}px bs={batch} "
          f"accum=2 fold_early={fold_early}", batch * 10 / dt)


def _host_data_bench(name, hparams, input_size, batch, epochs, workers):
    """End-to-end fps WITH the real host data path: JPEG files on disk →
    DataPipeline (native C++ thread-pool decoder when available) →
    jitted detector — the reference's actual serving regime (32-worker
    DataLoader, reference dataset/_helper.py:176-179). This host has ONE
    CPU core, so the sustained number is expected to be DECODE-bound far
    below the device-only headline; both the combined fps and the
    pure host decode ceiling are printed (the JSON line reports the
    combined number)."""
    import os
    import tempfile

    import jax
    import jax.numpy as jnp
    from uavdet_tpu.data import (DataPipeline, build_index,
                                 make_synthetic_dataset)
    from uavdet_tpu.data.native import native_available
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model

    root = tempfile.mkdtemp(prefix="uavdet_hostbench_")
    make_synthetic_dataset(root, splits=("train",), n_seq=2, n_frames=48,
                           img_size=input_size)
    recs = build_index(os.path.join(root, "train"))
    pipe = DataPipeline(recs, input_size, batch, train=False,
                        workers=workers, drop_last=True)
    n_frames_epoch = len(pipe) * batch

    model = build_model(name, hparams, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, input_size, input_size, 3), jnp.float32),
        train=False)
    detect = make_detector(model, hparams, input_size,
                           pallas_stem_variables=variables)

    # pure host decode ceiling (no device work)
    t0 = time.perf_counter()
    n = 0
    for b in iter(pipe):
        n += b.image.shape[0]
    host_fps = n / (time.perf_counter() - t0)

    def run_epoch():
        out = None
        for b in iter(pipe):
            out = detect(variables, jnp.asarray(b.image))
        # real device sync (block_until_ready lies on axon)
        return float(jnp.sum(out.scores))

    run_epoch()  # warmup: compile + native-decoder spin-up
    t0 = time.perf_counter()
    for _ in range(epochs):
        run_epoch()
    fps = epochs * n_frames_epoch / (time.perf_counter() - t0)
    print(f"# host decode ceiling: {host_fps:.1f} fps "
          f"(native={native_available()}, workers={workers}, 1 CPU core); "
          f"device-only headline for comparison: see default bench",
          file=sys.stderr)
    _emit(f"fps end-to-end WITH host data path (jpeg decode->detect) "
          f"{name} @ {input_size}px bs={batch} over {epochs} epochs "
          f"[host-bound]", fps)


class _CachedPipe:
    """Wrap a DataPipeline: first epoch decodes + device-puts every batch,
    later epochs replay the cached device arrays — isolating the Trainer
    loop's dispatch pattern from host decode."""

    def __init__(self, inner):
        self.inner = inner
        self._cache = None

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        if self._cache is None:
            import jax
            import jax.numpy as jnp
            self._cache = [jax.tree.map(jnp.asarray, b)
                           for b in iter(self.inner)]
        yield from self._cache


def _fit_rate_bench(cfg, epochs=4, batch=8, input_size=640, n_frames=56,
                    fold_early=True):
    """``Trainer.fit`` SUSTAINED img/s (VERDICT r2 item 7 / r3 item 5),
    cfg6-comparable configuration: DyYOLO @640, bs=8, grad-accum 2, bf16,
    nan_guard off, log_every_n_steps default (50).

    Prints two rates from one run each (epoch 0 excluded — it carries
    compile): (a) cached device batches — the Trainer dispatch pattern
    with data free, the number comparable to cfg6's bare-step rate, and
    (b) the on-disk manifest with the real host decode path — on this
    1-CPU-core host that one is DECODE-bound (see --host-data). The JSON
    line reports (a)."""
    import os
    import tempfile

    from uavdet_tpu.data import (DataPipeline, build_index,
                                 make_synthetic_dataset)
    from uavdet_tpu.training import MetricsWriter, Trainer
    from uavdet_tpu.utils.config import Config

    root = tempfile.mkdtemp(prefix="uavdet_fitbench_")
    make_synthetic_dataset(root, splits=("train", "val"), n_seq=2,
                           n_frames=n_frames, img_size=input_size)
    recs = build_index(os.path.join(root, "train"))
    va = DataPipeline(build_index(os.path.join(root, "val"))[:batch],
                      input_size, batch, train=False, seed=1)

    tcfg = dict(cfg.train.trainer.to_dict(),
                epochs=epochs, grad_batches=2, precision="bf16",
                train_batches=1.0, val_batches=1,
                check_val_every_n_epoch=10 ** 6,  # pure train-loop timing
                nan_guard=False,
                fold_early=fold_early)  # match cfg6 (the product knob;
    # --no-fold-early is the A/B switch)
    fit_cfg = Config(dict(
        cfg.to_dict(),
        dataset=dict(cfg.dataset.to_dict(), batch_size=batch,
                     image_size=[input_size, input_size]),
        train=dict(cfg.train.to_dict(), trainer=tcfg,
                   checkpoint=dict(cfg.train.checkpoint.to_dict(),
                                   dir=os.path.join(root, "ck")))))

    rates = {}
    for mode in ("cached", "disk"):
        tr = DataPipeline(recs, input_size, batch, train=True, seed=2,
                          workers=int(cfg.dataset.get("workers", 1) or 1))
        pipe = _CachedPipe(tr) if mode == "cached" else tr
        t = Trainer(fit_cfg, pipe, va,
                    metrics=MetricsWriter(os.path.join(root, f"dv_{mode}")))
        t.fit()
        n_imgs = len(tr) * batch
        sustained = [n_imgs / s for s in t.epoch_seconds[1:]]
        rates[mode] = float(np.median(sustained))
        print(f"# fit-rate[{mode}]: epochs {['%.1f' % (n_imgs / s) for s in t.epoch_seconds]} img/s "
              f"(epoch0 incl. compile), sustained median "
              f"{rates[mode]:.1f} img/s", file=sys.stderr)

    print(f"# fit-rate: cached {rates['cached']:.1f} img/s (dispatch "
          f"pattern, cfg6-comparable) | on-disk {rates['disk']:.1f} img/s "
          f"(host-decode-bound on this 1-core host)", file=sys.stderr)
    _emit(f"Trainer.fit sustained img/s (cached device batches) DyYOLO "
          f"@{input_size}px bs={batch} accum=2 fold_early={fold_early}",
          rates["cached"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--model", default=None,
                    help="model name override (default: params.yaml)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes for a fast CI smoke run")
    ap.add_argument("--microbatch", type=int, default=None,
                    help="cfg3: sequential sub-batch size. Default: the"
                    " full bs=32 in ONE program — the folded-stem path"
                    " (models/dysoem_simfpn.py::fold_input_stem) composes"
                    " the 1x1 stem past space_to_depth so the 12.5 GB"
                    " 4x-lane-padded stem activation never materializes")
    ap.add_argument("--no-pallas-stem", action="store_true",
                    help="disable the fused INFERENCE stem fast paths"
                    " (Pallas stem kernels; cfg3/cfg4 folded fronts)")
    ap.add_argument("--no-fold-early", action="store_true",
                    help="cfg6/--fit-rate: disable the parity-folded"
                    " early stage in the TRAIN step (the"
                    " train.trainer.fold_early product knob)")
    ap.add_argument("--host-data", action="store_true",
                    help="measure end-to-end fps WITH the host data path"
                    " (on-disk JPEGs -> DataPipeline -> detector),"
                    " sustained over --epochs epochs")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workers", type=int, default=None,
                    help="host-data mode: decode workers (default: cpu"
                    " count)")
    ap.add_argument("--config", type=int, default=None,
                    choices=[1, 2, 3, 4, 5, 6],
                    help="BASELINE.json workload config (see module doc)")
    ap.add_argument("--fit-rate", action="store_true",
                    help="measure Trainer.fit sustained img/s (cached"
                    " device batches + on-disk manifest), cfg6-comparable")
    args = ap.parse_args()

    import jax  # noqa: F401  (initialize before model building)
    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from uavdet_tpu.utils.config import load_config, load_params

    cfg = load_params("params.yaml")
    hparams = cfg.model.hparams
    name = args.model or cfg.model.name
    input_size = 64 if args.smoke else args.input
    batch = 2 if args.smoke else args.batch

    if args.smoke:
        hparams.layer_config = [
            ["DyConv", 8, 3, 1], [16, 3, 2], ["B", 1], [32, 3, 2], ["B", 8],
            [64, 3, 2], ["B", 8], [128, 3, 2], ["B", 1], [64, 1, 1],
            [128, 3, 1], ["S"], [32, 1, 1], ["U"], [32, 1, 1], [64, 3, 1],
            ["S"], [16, 1, 1], ["U"], [16, 1, 1], [32, 3, 1], ["S"]]

    if args.host_data:
        import os
        _host_data_bench(name, hparams, input_size, batch, args.epochs,
                         args.workers or os.cpu_count() or 1)
    elif args.fit_rate:
        _fit_rate_bench(cfg, epochs=max(args.epochs, 3),
                        input_size=input_size,
                        n_frames=8 if args.smoke else 56,
                        fold_early=not args.no_fold_early)
    elif args.config is None:
        _detector_bench(name, hparams, batch, input_size, args.iters,
                        args.warmup,
                        pre_nms_topk=256 if args.smoke else 512,
                        pallas_stem=not args.no_pallas_stem and
                        not args.smoke)
    elif args.config == 1:
        base = load_config("conf", model="baseline")
        _detector_bench("baseline", base.model.hparams, 1, 640, args.iters,
                        args.warmup, metric_suffix=" [cfg1 rgb]")
    elif args.config == 2:
        _dual_stream_bench("DyYOLO", load_config(
            "conf", model="dy-yolo").model.hparams, 8, 640, args.iters,
            args.warmup, pallas_stem=not args.no_pallas_stem)
    elif args.config == 3:
        soem = load_config("conf", model="dy-soem_fpn")
        _detector_bench("DySOEM_SimFPN", soem.model.hparams, 32, 1280,
                        min(args.iters, 10), args.warmup,
                        metric_suffix=" [cfg3 ir thermal]",
                        microbatch=args.microbatch,
                        # gates the folded-stem fast path (DySOEM has no
                        # Pallas stem; the flag is the A/B switch for
                        # fold_input_stem exactly as for cfg2's stem)
                        pallas_stem=not args.no_pallas_stem)
    elif args.config == 4:
        _rtm_detector_bench(8, 640, args.iters, args.warmup,
                            fold=not args.no_pallas_stem)
    elif args.config == 5:
        _rtm_detector_bench(8, 640, args.iters, args.warmup,
                            train_loop=True,
                            fold=not args.no_fold_early)
    elif args.config == 6:
        _dyyolo_train_bench(load_config("conf", model="dy-yolo"),
                            args.warmup,
                            fold_early=not args.no_fold_early)
    return 0


if __name__ == "__main__":
    sys.exit(main())
