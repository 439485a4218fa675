"""Command-line interface.

The reference has no CLI at all — scripts hard-code absolute paths
(``hcat/main.py:57-66``, ``train_rcnn.py:18``).  Subcommands:

    analyze      one z-stack end-to-end (checkpointed U-Net + detector)
    batch        walk a data root, analyze every tif (manifest-resumable)
    train-unet   train the valid-conv U-Net on Stack triplets
    train-rcnn   train the detection head on Section xml/tif pairs
    train-recurrent  train RecursiveUnet / RDCNet on RecursiveStack data
    predict-recurrent  run a recurrent checkpoint over a z-stack (packed)
    preprocess   build PWL/COM/vector training targets from label masks
    validate     dice / pixel-error validation on a Stack dataset
    study        aggregate per-cell stats across analyzed images (+figures)
    pretrain-backbone  synthetic backbone pretraining (no-egress ImageNet sub)
    bench        run the headline benchmark (--pipeline: full analyze())
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_analyze(sub):
    p = sub.add_parser("analyze", help="analyze one cochlea z-stack")
    p.add_argument("image")
    p.add_argument("--unet", required=True, help=".hcunet checkpoint")
    p.add_argument("--detector", default=None, help="detector checkpoint (optional)")
    p.add_argument("--out", default=None, help="work/output dir")
    p.add_argument("--numchunks", type=int, default=3)
    p.add_argument("--no-cochlea", action="store_true")
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace into this directory")
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="shard each chunk's X axis over this many devices "
                        "(ICI halo exchange)")
    _add_transfer_flags(p)


def _add_transfer_flags(p):
    p.add_argument("--prob-dtype", default="float32",
                   choices=("float32", "uint16", "bfloat16"),
                   help="device->host dtype for the probability map: "
                        "float32 = exact (default); uint16 = fixed-point "
                        "transfer diet, 2 B/voxel at <=7.6e-5 max error — "
                        "the remote-tunnel link serializes h2d+d2h, so "
                        "halved bytes convert ~1:1 into wall time "
                        "(BASELINE.md link characterization)")
    p.add_argument("--tail-workers", type=int, default=1,
                   help="concurrent host-side chunk tails (detection "
                        "collect + instance watershed); >1 keeps floods "
                        "from consecutive chunks running while the device "
                        "works — output is order-preserved and identical")


def _add_batch(sub):
    p = sub.add_parser("batch", help="analyze every tif under a root")
    p.add_argument("data_root")
    p.add_argument("--unet", required=True)
    p.add_argument("--detector", default=None)
    p.add_argument("--numchunks", type=int, default=6)
    p.add_argument("--retry-errors", action="store_true")
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="shard each chunk's X axis over this many devices")
    _add_transfer_flags(p)


def _add_train_unet(sub):
    p = sub.add_parser("train-unet", help="train the 3D U-Net")
    p.add_argument("data", help="directory of X.tif / X.mask.tif / X.pwl.tif")
    p.add_argument("--out", default="unet.hcunet")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--crop", type=int, nargs=3, default=[128, 128, 24])
    p.add_argument("--loss-method", default="pixel",
                   choices=["pixel", "worst_z", "sigmoid"])
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each train batch over this many devices "
                        "(gradient psum over ICI); groups this many crops "
                        "per step")


def _add_train_recurrent(sub):
    p = sub.add_parser(
        "train-recurrent",
        help="train RecursiveUnet or RDCNet (the hcat/r_unet.py recipe: "
        "pwl-BCE on the probability channel + MSE on the vector channels)",
    )
    p.add_argument("data", help="directory of X.tif / X.mask.tif / X.pwl.tif "
                                "/ X.labels.com.tif / X.labels.vector.pkl "
                                "(see `hcunet preprocess`)")
    p.add_argument("--model", default="runet", choices=["runet", "rdcnet"])
    p.add_argument("--out", default="recurrent.hcunet")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--crop", type=int, nargs=3, default=[128, 128, 10])
    p.add_argument("--timesteps", type=int, default=None,
                   help="override the recurrence depth")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each train batch over this many devices")


def _add_predict_recurrent(sub):
    p = sub.add_parser(
        "predict-recurrent",
        help="run a recurrent checkpoint over a z-stack through the packed "
        "recurrent serving compiler; writes the raw head stack "
        "[X, Y, Z, out_channels] as .npy (sigmoid channel 0 for the "
        "probability map)",
    )
    p.add_argument("images", nargs="+", help="tif/npy z-stacks; same-shaped "
                   "stacks are batched per dispatch (B=4 measured 3.3x/volume "
                   "on v5e)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out-dir", default=".",
                   help="writes <stem>.recurrent.npy per input")
    p.add_argument("--no-packed", action="store_true",
                   help="bypass the packed serving compiler")
    p.add_argument("--split-x", type=int, nargs="?", const=4, default=0,
                   metavar="N",
                   help="single-volume latency mode: run each volume as N "
                        "(default 4) overlapping x-tiles batched on the "
                        "leading dim with per-timestep halo exchange "
                        "(bit-identical; RecursiveUNet 1.65->2.64, RDCNet "
                        "6.9->10.1 MVx/s at B=1/N=4 on v5e)")


def _add_train_rcnn(sub):
    p = sub.add_parser("train-rcnn", help="train the detection head")
    p.add_argument("data", help="directory of X.tif + X.xml (VOC boxes)")
    p.add_argument("--out", default="detector.hcunet")
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--gamma", type=float, default=0.997)
    p.add_argument("--scale", type=float, default=3.0)
    p.add_argument("--simple-class", action="store_true")
    p.add_argument("--batch-size", type=int, default=1,
                   help="samples per optimizer step (vmapped B=1 losses, "
                        "gradients averaged; the reference is strictly "
                        "batch=1)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard each global batch over N devices "
                        "(data-axis mesh; batch size defaults to N)")
    p.add_argument("--backbone", choices=("resnet50", "small"),
                   default="resnet50",
                   help="resnet50 = the reference's production architecture "
                        "(hcat/rcnn.py:14-20); small = a light FPN trunk "
                        "for quick runs")


def _add_preprocess(sub):
    p = sub.add_parser("preprocess", help="build training targets")
    p.add_argument("data", help="directory of *.labels.tif color masks")
    p.add_argument("--workers", type=int, default=os.cpu_count() or 1)


def _add_validate(sub):
    p = sub.add_parser(
        "validate", help="dice / pixel-error validation on a Stack dataset"
    )
    p.add_argument("data", help="directory of X.tif / X.mask.tif / X.pwl.tif")
    p.add_argument("--unet", required=True)
    p.add_argument("--threshold", type=float, default=0.5)


def _add_study(sub):
    p = sub.add_parser(
        "study",
        help="aggregate per-cell stats across analyzed images, with the "
        "study boxplot/regression figures (validate.py:386-415)",
    )
    p.add_argument(
        "dirs", nargs="+",
        help="analyzed work dirs (chunk .cells.npz journals) or legacy "
        "all_cells.pkl files; experiment metadata is parsed from the "
        "directory names",
    )
    p.add_argument("--out", default="study_out")
    p.add_argument("--group-by", default="promoter")


def _add_pretrain(sub):
    p = sub.add_parser(
        "pretrain-backbone",
        help="pretrain the detector's ResNet trunk on a synthetic shape "
        "task (this environment's substitute for ImageNet weights)",
    )
    p.add_argument("--out", default="backbone.msgpack")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--width", type=int, default=64)


def main(argv=None):
    from hcunet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="hcunet", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_analyze(sub)
    _add_batch(sub)
    _add_train_unet(sub)
    _add_train_rcnn(sub)
    _add_train_recurrent(sub)
    _add_predict_recurrent(sub)
    _add_preprocess(sub)
    _add_validate(sub)
    _add_study(sub)
    _add_pretrain(sub)
    p = sub.add_parser("bench", help="run the headline benchmark")
    p.add_argument("--pipeline", action="store_true",
                   help="benchmark only the full analyze() pipeline")
    p.add_argument("--headline", action="store_true",
                   help="benchmark only the tiled-inference headline")
    p.add_argument("--recurrent", action="store_true",
                   help="benchmark only the recurrent packed serving")
    args = parser.parse_args(argv)

    if args.cmd == "bench":
        from hcunet_tpu import benchmarks as bench

        flags = []
        if args.pipeline:
            flags.append("--pipeline")
        if args.headline:
            flags.append("--headline")
        if args.recurrent:
            flags.append("--recurrent")
        return bench.run(flags)

    if args.cmd == "preprocess":
        return _cmd_preprocess(args)
    if args.cmd == "validate":
        return _cmd_validate(args)
    if args.cmd == "study":
        return _cmd_study(args)
    if args.cmd == "pretrain-backbone":
        return _cmd_pretrain(args)
    if args.cmd == "train-unet":
        return _cmd_train_unet(args)
    if args.cmd == "train-rcnn":
        return _cmd_train_rcnn(args)
    if args.cmd == "train-recurrent":
        return _cmd_train_recurrent(args)
    if args.cmd == "predict-recurrent":
        return _cmd_predict_recurrent(args)
    if args.cmd in ("analyze", "batch"):
        return _cmd_analyze_like(args)
    return 1


def _load_models(unet_path, detector_path):
    import jax

    from hcunet_tpu.utils.checkpoint import load_checkpoint, load_unet

    model, variables, _ = load_unet(unet_path)
    # production serving path: BN-folded z-block-packed forward
    # (infer/compile.py falls back to plain apply for 2D/dilated configs)
    from hcunet_tpu.infer.compile import compile_serving_apply

    import jax.numpy as jnp

    unet_apply = jax.tree_util.Partial(
        compile_serving_apply(
            model, variables, dtype=getattr(model, "dtype", None) or jnp.float32
        )
    )
    detector = detector_vars = None
    if detector_path:
        from hcunet_tpu.models.detection import Detector

        det_cfg, detector_vars, _ = load_checkpoint(detector_path)
        detector = Detector(det_cfg)
    return model, unet_apply, detector, detector_vars


def _make_spatial_mesh(n_shards: int):
    if n_shards <= 1:
        return None
    import jax

    from hcunet_tpu.parallel.mesh import SPATIAL_AXIS, make_mesh

    devices = jax.devices()
    if len(devices) < n_shards:
        raise SystemExit(
            f"--spatial-shards {n_shards} needs {n_shards} devices, "
            f"have {len(devices)}"
        )
    return make_mesh({SPATIAL_AXIS: n_shards}, devices[:n_shards])


def _cmd_analyze_like(args):
    from hcunet_tpu.config import PipelineConfig
    from hcunet_tpu.infer.pipeline import analyze

    model, unet_apply, detector, det_vars = _load_models(args.unet, args.detector)
    cfg = PipelineConfig(
        numchunks=args.numchunks, unet=model.config,
        prob_transfer_dtype=getattr(args, "prob_dtype", "float32"),
    )
    mesh = _make_spatial_mesh(getattr(args, "spatial_shards", 1))
    tail_workers = max(0, int(getattr(args, "tail_workers", 1)))

    if args.cmd == "analyze":
        import contextlib

        out = args.out or os.path.splitext(args.image)[0] + "_cellBycell"
        ctx = contextlib.nullcontext()
        if getattr(args, "trace", None):
            from hcunet_tpu.utils.profiling import trace

            ctx = trace(args.trace)
        with ctx:
            result = analyze(
                args.image, unet_apply=unet_apply, detector=detector,
                detector_variables=det_vars, cfg=cfg, work_dir=out,
                fit_cochlea=not args.no_cochlea, mesh=mesh,
                overlap=tail_workers,
            )
        print(json.dumps({"cells": len(result.cells), "out": out}))
        return 0

    from hcunet_tpu.apps.batch import run_batch

    def one(img, out_dir):
        analyze(
            img, unet_apply=unet_apply, detector=detector,
            detector_variables=det_vars, cfg=cfg, work_dir=out_dir,
            mesh=mesh, overlap=tail_workers,
        )

    results = run_batch(args.data_root, one, retry_errors=args.retry_errors)
    print(json.dumps(results, indent=2))
    return 0


def _cmd_train_unet(args):
    import jax

    from hcunet_tpu.config import UNetConfig
    from hcunet_tpu.data import transforms as t
    from hcunet_tpu.data.datasets import Stack
    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.train.trainer import TrainConfig, UNetTrainer

    # the canonical augment recipe (reference tests/transforms_test.py:22-39)
    ds = Stack(
        args.data,
        joint_transforms=[
            t.to_float(), t.reshape(), t.nul_crop(rate=1),
            t.random_crop(args.crop),
            t.elastic_deform(grid_shape=(4, 4, 3), scale=5),
        ],
        image_transforms=[
            t.random_gamma((0.7, 1.3)),
            t.random_intensity(range=(-15, 15)),
            t.drop_channel(0.2),
            t.spekle(0.00001),
            t.clean_image(),
            t.normalize(),
        ],
    )
    cfg = UNetConfig.production_3d()
    model, variables = init_unet(cfg, jax.random.PRNGKey(0))
    mesh = None
    if args.data_parallel > 1:
        from hcunet_tpu.parallel.mesh import DATA_AXIS, make_mesh

        devices = jax.devices()
        if len(devices) < args.data_parallel:
            raise SystemExit(
                f"--data-parallel {args.data_parallel} needs that many "
                f"devices, have {len(devices)}"
            )
        mesh = make_mesh(
            {DATA_AXIS: args.data_parallel}, devices[: args.data_parallel]
        )
    trainer = UNetTrainer(
        model, variables,
        TrainConfig(learning_rate=args.lr, epochs=args.epochs,
                    loss_method=args.loss_method, checkpoint_path=args.out),
        mesh=mesh,
    )
    trainer.fit(ds)
    trainer.save(args.out)
    print(json.dumps({"checkpoint": args.out}))
    return 0


def _cmd_train_recurrent(args):
    import dataclasses

    import jax

    from hcunet_tpu.data import transforms as t
    from hcunet_tpu.data.datasets import RecursiveStack
    from hcunet_tpu.train.trainer import RecurrentTrainer, TrainConfig

    # recurrent recipe (reference tests/r_unet_test.py:20-44): joint crops
    # only — the vector field is geometry-coupled, so photometric augments
    # stay on the image
    ds = RecursiveStack(
        args.data,
        joint_transforms=[
            t.to_float(), t.reshape(), t.nul_crop(rate=1),
            t.random_crop(args.crop),
        ],
        image_transforms=[
            t.random_gamma((0.7, 1.3)),
            t.clean_image(),
            t.normalize(),
        ],
    )
    if args.model == "runet":
        from hcunet_tpu.config import RUNetConfig
        from hcunet_tpu.models.runet import RecursiveUNet

        cfg = RUNetConfig()
        if args.timesteps:
            cfg = dataclasses.replace(cfg, timesteps=args.timesteps)
        model = RecursiveUNet(cfg)
    else:
        from hcunet_tpu.config import RDCNetConfig
        from hcunet_tpu.models.rdcnet import RDCNet

        cfg = RDCNetConfig()
        if args.timesteps:
            cfg = dataclasses.replace(cfg, timesteps=args.timesteps)
        model = RDCNet(cfg)
    import numpy as np

    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, *args.crop, cfg.in_channels), np.float32),
    )
    mesh = None
    if args.data_parallel > 1:
        from hcunet_tpu.parallel.mesh import DATA_AXIS, make_mesh

        devices = jax.devices()
        if len(devices) < args.data_parallel:
            raise SystemExit(
                f"--data-parallel {args.data_parallel} needs that many "
                f"devices, have {len(devices)}"
            )
        mesh = make_mesh(
            {DATA_AXIS: args.data_parallel}, devices[: args.data_parallel]
        )
    trainer = RecurrentTrainer(
        model, dict(variables),
        TrainConfig(learning_rate=args.lr, epochs=args.epochs,
                    checkpoint_path=args.out),
        mesh=mesh,
    )
    trainer.fit(ds)
    trainer.save(args.out)
    print(json.dumps({"checkpoint": args.out, "model": args.model}))
    return 0


def _cmd_predict_recurrent(args):
    import jax
    import numpy as np

    from hcunet_tpu.config import RDCNetConfig, RUNetConfig
    from hcunet_tpu.infer.pipeline import _load_volume
    from hcunet_tpu.utils.checkpoint import load_checkpoint

    # untyped restore: the raw numpy-leaf tree applies directly (flax
    # accepts plain dicts), so one read suffices — no template re-init
    config, variables, _ = load_checkpoint(args.checkpoint)
    if isinstance(config, RUNetConfig):
        from hcunet_tpu.models.runet import RecursiveUNet

        model = RecursiveUNet(config)
    elif isinstance(config, RDCNetConfig):
        from hcunet_tpu.models.rdcnet import RDCNet

        model = RDCNet(config)
    else:
        raise SystemExit(f"not a recurrent checkpoint: {type(config).__name__}")

    if args.no_packed:
        apply_fn = jax.tree_util.Partial(
            lambda v, t_: model.apply(v, t_, train=False), variables
        )
    else:
        import jax.numpy as jnp

        from hcunet_tpu.infer.compile_recurrent import compile_recurrent_apply

        apply_fn = jax.tree_util.Partial(
            compile_recurrent_apply(
                model, variables, dtype=jnp.bfloat16,
                split_x=args.split_x if args.split_x else 1,
            )
        )

    # group same-shaped stacks into one batched dispatch each — unless the
    # user asked for --split-x single-volume latency mode, whose packed
    # program only engages at B=1 (batching two stacks would silently run
    # the unsplit program, review r4 #4): then every volume dispatches alone
    by_shape = {}
    vols = {}
    for k, path in enumerate(args.images):
        vol = _load_volume(path)
        if np.issubdtype(vol.dtype, np.integer):
            from hcunet_tpu.data.transforms import integer_unit_scale

            vol = vol.astype(np.float32) / integer_unit_scale(vol.dtype)
        vol = ((vol - 0.5) / 0.5).astype(np.float32)
        vols[path] = vol
        key = (vol.shape, k) if (args.split_x or 0) > 1 else vol.shape
        by_shape.setdefault(key, []).append(path)
    os.makedirs(args.out_dir, exist_ok=True)
    outputs = {}
    for shape, paths in by_shape.items():
        batch = np.stack([vols[p] for p in paths])
        out = np.asarray(apply_fn(batch))
        for i, p in enumerate(paths):
            stem = os.path.splitext(os.path.basename(p))[0]
            dst = os.path.join(args.out_dir, stem + ".recurrent.npy")
            np.save(dst, out[i])
            outputs[p] = dst
    print(json.dumps({"outputs": outputs}))
    return 0


def _cmd_train_rcnn(args):
    import jax

    from hcunet_tpu.config import DetectorConfig
    from hcunet_tpu.data import transforms as t
    from hcunet_tpu.data.datasets import Section
    from hcunet_tpu.models.detection import Detector
    from hcunet_tpu.train.detection_trainer import (
        DetectionTrainConfig,
        DetectionTrainer,
    )
    from hcunet_tpu.utils.checkpoint import save_checkpoint

    ds = Section(
        args.data,
        image_transforms=[t.to_float(), t.remove_channel()],
        simple_class=args.simple_class,
    )
    n_classes = 3 if args.simple_class else 5
    cfg = DetectorConfig(num_classes=n_classes)
    det = Detector(cfg, backbone=args.backbone)
    img0, _ = ds[0]
    variables = det.init(jax.random.PRNGKey(0), img0.shape[1:3])
    mesh = None
    if args.data_parallel and args.data_parallel > 1:
        from hcunet_tpu.parallel.mesh import DATA_AXIS, make_mesh

        mesh = make_mesh(
            {DATA_AXIS: args.data_parallel},
            jax.devices()[: args.data_parallel],
        )
    batch = args.batch_size if args.batch_size > 1 else (
        args.data_parallel if mesh is not None else 1
    )
    if mesh is not None and batch % args.data_parallel:
        raise SystemExit(
            f"--batch-size {batch} must be a multiple of --data-parallel "
            f"{args.data_parallel}: each device takes batch/N samples of "
            f"the sharded global batch"
        )
    trainer = DetectionTrainer(
        det, variables,
        DetectionTrainConfig(
            learning_rate=args.lr, gamma=args.gamma,
            classifier_scale=args.scale, epochs=args.epochs,
        ),
        steps_per_epoch=max(1, -(-len(ds) // max(batch, 1))),
        mesh=mesh,
        batch_size=batch,
    )
    trainer.fit(ds)
    save_checkpoint(args.out, trainer.variables, cfg)
    print(json.dumps({"checkpoint": args.out}))
    return 0


def _cmd_validate(args):
    from hcunet_tpu.analysis.validate import validate_segmentation
    from hcunet_tpu.data import transforms as t
    from hcunet_tpu.data.datasets import Stack

    model, unet_apply, _, _ = _load_models(args.unet, None)
    ds = Stack(
        args.data,
        joint_transforms=[t.to_float(), t.reshape()],
        image_transforms=[t.normalize()],
    )
    results = validate_segmentation(
        unet_apply, ds, model.config, threshold=args.threshold
    )
    summary = [
        {k: r[k] for k in ("index", "dice", "missed_ratio", "false_ratio")}
        for r in results
    ]
    print(json.dumps(summary, indent=2))
    return 0


def _cmd_study(args):
    import glob as g

    from hcunet_tpu.analysis.validate import StudyAggregate, load_legacy_cells
    from hcunet_tpu.infer.pipeline import _load_cells

    agg = StudyAggregate()
    n_images = 0
    for path in args.dirs:
        if os.path.isfile(path) and path.endswith(".pkl"):
            agg.add_image(os.path.dirname(path) or path, load_legacy_cells(path))
            n_images += 1
            continue
        cells = []
        for npz in sorted(g.glob(os.path.join(path, "*.cells.npz"))):
            cells.extend(_load_cells(npz))
        if cells:
            agg.add_image(path, cells)
            n_images += 1
    if not agg.rows:
        print("no cells found", file=sys.stderr)
        return 1
    os.makedirs(args.out, exist_ok=True)
    agg.dataframe().to_csv(os.path.join(args.out, "study.csv"), index=False)
    figures = agg.save_figures(args.out, group_by=args.group_by)
    reg = agg.gfp_vs_gain_regression()
    print(
        json.dumps(
            {
                "images": n_images,
                "cells": len(agg.rows),
                "csv": os.path.join(args.out, "study.csv"),
                "figures": figures,
                "gfp_vs_gain": reg,
            }
        )
    )
    return 0


def _cmd_pretrain(args):
    from hcunet_tpu.train.pretrain import pretrain_backbone, save_backbone

    backbone = pretrain_backbone(
        steps=args.steps, batch=args.batch, lr=args.lr, width=args.width
    )
    save_backbone(args.out, backbone)
    print(json.dumps({"backbone": args.out}))
    return 0


def _cmd_preprocess(args):
    import glob as g
    from multiprocessing import Pool

    from hcunet_tpu.train.targets import preprocess_volume

    files = sorted(g.glob(os.path.join(args.data, "*.labels.tif")))
    if not files:
        print("no *.labels.tif found", file=sys.stderr)
        return 1
    if args.workers > 1:
        with Pool(args.workers) as pool:
            pool.map(preprocess_volume, files)
    else:
        for f in files:
            preprocess_volume(f)
    print(json.dumps({"processed": len(files)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
