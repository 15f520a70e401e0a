"""Training CLI — the `python basicsr/train.py -opt <yml>` analog.

Reads a reference-style option YAML (the files under the reference's
options/ load unmodified), builds the stage trainer + dataset + loop:

    python -m pgtformer_tpu.train_cli -opt options/release_train_stage_I_need_align_version.yml \
        --data-root /data/vfhq --exp-dir exp/stage1 [--stage I]

The YAML's s3/private-backend dataset paths are overridden by --data-root
(the reference's storage client is private; see data/vfhq.py for the local
layout).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def detect_stage(opt: dict, options_path: str) -> str:
    """Resolve the training stage (I/II/III/IV).

    Precedence: an explicit `stage:` key in the options -> the filename's
    `stage_<I+>` run length (longest match, so the reference's
    `..._stage_IIII_dont_need_align_version.yml` resolves to IV, not III)
    -> the `model_type`/`code_only` convention (TRQVAEModel = I,
    TRQCodeFormerModel + code_only = II — SURVEY.md §3.2-3.4).  Raises
    rather than guessing: silently training the wrong stage recipe is
    worse than asking for --stage.
    """
    import re
    s = str(opt.get("stage", "")).upper()
    roman = {"I": "I", "II": "II", "III": "III", "IV": "IV", "IIII": "IV",
             "1": "I", "2": "II", "3": "III", "4": "IV"}
    if s:
        if s not in roman:
            raise SystemExit(f"options key stage: {s!r} is not a stage "
                             "(expected I/II/III/IV)")
        return roman[s]
    # match the FILENAME only — a stage-named directory component
    # (exp/stage_II_sweeps/...) must not override it
    m = re.search(r"stage_(IV|I+)(?![IV])", os.path.basename(options_path))
    if m and m.group(1) in roman:
        return roman[m.group(1)]
    mt = str(opt.get("model_type", ""))
    if mt == "TRQVAEModel":
        return "I"
    if mt == "TRQCodeFormerModel" and opt.get("code_only"):
        return "II"
    raise SystemExit(
        f"cannot infer training stage from {options_path!r} (no `stage:` "
        "key, no stage_<N> filename pattern, ambiguous model_type) — "
        "pass --stage I/II/III/IV")


def build_from_options(opt: dict, stage: str, data_root: str,
                       mesh=None, lpips_fn=None, dtype=None,
                       use_pallas: bool = False):
    import jax.numpy as jnp
    from pgtformer_tpu.config import (
        vqvae_config_from_options, pgtformer_config_from_options)
    from pgtformer_tpu.train.stages import (
        Stage1Trainer, PGTFormerTrainer, StageHyper, STAGE_HYPERS)

    tr = opt.get("train", {})
    base = STAGE_HYPERS[stage]
    over = {
        "lr_g": float(tr.get("optim_g", {}).get("lr", base.lr_g)),
        "lr_d": float(tr.get("optim_d", {}).get("lr", base.lr_d)),
        "milestones": tuple(int(m) for m in
                            tr.get("scheduler", {}).get("milestones",
                                                        base.milestones)),
        "gamma": float(tr.get("scheduler", {}).get("gamma", base.gamma)),
        "warmup_iter": int(tr.get("warmup_iter", base.warmup_iter)),
        "total_iter": int(tr.get("total_iter", base.total_iter)),
        "ema_decay": float(tr.get("ema_decay", base.ema_decay)),
        "gan_start_iter": int(tr.get("gan_start_iter", base.gan_start_iter)),
        "gan_weight": float(tr.get("gan_opt", {}).get("loss_weight",
                                                      base.gan_weight)),
    }
    # the YAML loss blocks drive the loss recipe directly (reference
    # build_loss from each *_opt subtree; per-stage blocks differ —
    # e.g. feat is MSELoss in stages II/III but L1Loss in IV)
    _loss_types = {"CrossEntropyLoss": "ce", "FocalLoss": "focal",
                   "MSELoss": "mse", "L1Loss": "l1",
                   "GRADL1Loss": "gradl1", "LPIPSLoss": "lpips",
                   "TemporalLPIPSLoss": "temporal_lpips"}

    def _loss(key, kind_field, weight_field, absent_kind):
        blk = tr.get(key)
        if blk is None:
            if key in ("pixel_opt", "perceptual_opt"):
                over[kind_field] = absent_kind
            return
        over[kind_field] = _loss_types.get(str(blk.get("type")),
                                           getattr(base, kind_field))
        if weight_field and "loss_weight" in blk:
            over[weight_field] = float(blk["loss_weight"])
        if key == "pixel_opt" and "lossmulti" in blk:
            over["lossmulti"] = tuple(float(x) for x in blk["lossmulti"])
        if key == "perceptual_opt" and "tgrad_weight" in blk:
            over["tgrad_weight"] = float(blk["tgrad_weight"])

    if stage != "I":
        _loss("token_opt", "token_loss", "token_weight", "ce")
        _loss("feat_opt", "feat_loss", "feat_weight", "mse")
    _loss("pixel_opt", "pixel_loss", "pixel_weight", "none")
    _loss("perceptual_opt", "perceptual", None, "none")
    if "gan_opt" in tr or "use_gan" in tr:
        over["use_gan"] = bool(tr.get("use_gan", tr.get("gan_opt")))
    hp = StageHyper(**{**base.__dict__, **over})

    dtype = dtype if dtype is not None else jnp.float32
    if stage == "I":
        cfg = vqvae_config_from_options(opt, network_key="network_g")
        trainer = Stage1Trainer(cfg, hp, lpips_fn=lpips_fn, mesh=mesh,
                                dtype=dtype, use_pallas=use_pallas)
    else:
        cfg = pgtformer_config_from_options(opt, network_key="network_g")
        trainer = PGTFormerTrainer(cfg, stage=stage, hp=hp,
                                   lpips_fn=lpips_fn, mesh=mesh, dtype=dtype,
                                   use_pallas=use_pallas)
    return trainer, hp


def main(argv=None):
    parser = argparse.ArgumentParser(description="pgtformer_tpu trainer")
    parser.add_argument("-opt", "--options", required=True,
                        help="reference-style option YAML")
    parser.add_argument("--data-root", required=True,
                        help="VFHQ dataset root (see data/vfhq.py layout)")
    parser.add_argument("--exp-dir", default=None)
    parser.add_argument("--stage", default=None,
                        choices=["I", "II", "III", "IV"],
                        help="override stage detection from the YAML name")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--teacher-ckpt", default=None,
                        help="stage II+: frozen teacher (`network_gt`) — a "
                             "reference-format .pth or an orbax net_g_* "
                             "export dir from a stage-I run")
    parser.add_argument("--student-ckpt", default=None,
                        help="stage II+: initialize the student from a "
                             "previous stage's net_g_* export "
                             "(non-strict subtree merge — the reference's "
                             "`pretrain_network_g` + `strict_load_g: "
                             "false` chain: I->II->III->IV)")
    parser.add_argument("--disc-ckpt", default=None,
                        help="initialize the discriminator from a previous "
                             "stage's net_d_* export (the reference's "
                             "`pretrain_network_d` + `strict_load_d: true`: "
                             "stage III loads stage I's net_d, stage IV "
                             "loads stage III's — a carried, calibrated D; "
                             "a random-init D memorizes small sets, hinge-"
                             "saturates, and G runs away against it)")
    parser.add_argument("--no-lpips", action="store_true")
    parser.add_argument("--lpips-weights", default=None,
                        help="lpips.LPIPS(net='vgg') state_dict (.pth) for "
                             "metric-grade perceptual loss; without it the "
                             "VGG runs randomly initialized (loud warning)")
    parser.add_argument("--total-iter", type=int, default=None,
                        help="override the YAML's total_iter (smoke runs)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (halves activation memory; "
                             "needed for full-512 stage III/IV on 16GB chips)")
    parser.add_argument("--pallas", action="store_true",
                        help="run the SW-attention towers through the fused "
                             "Pallas kernel (TPU; custom-VJP backward)")
    parser.add_argument("--val-data-root", default=None,
                        help="VFHQ val split root; enables the periodic "
                             "val loop (PSNR/SSIM + saved images, reference "
                             "options/*.yml `val:` blocks)")
    parser.add_argument("--val-samples", type=int, default=8)
    parser.add_argument("--devices", type=int, default=None,
                        help="train on the first N devices only (default: "
                             "all; 1 disables the mesh/shard_map path)")
    parser.add_argument("--num-workers", type=int, default=None,
                        help="loader workers (default: YAML "
                             "num_worker_per_gpu, reference "
                             "options/...yml:29); 0 = synchronous")
    parser.add_argument("--prefetch", type=int, default=2,
                        help="batches kept in flight ahead of the consumer "
                             "(reference prefetch_mode analog)")
    parser.add_argument("--batch-dtype", default="uint8",
                        choices=["uint8", "float32"],
                        help="host->device batch transfer dtype: uint8 "
                             "ships 4x fewer bytes and dequantizes inside "
                             "the jitted step (default; gt is exact, lq "
                             "picks up <=0.5/255 quantization)")
    parser.add_argument("--upload-prefetch", type=int, default=2,
                        help="device-resident batches uploaded ahead of "
                             "the train step on a transfer thread "
                             "(0 = synchronous upload)")
    from pgtformer_tpu import knobs
    knobs.add_cli_flags(parser)
    args = parser.parse_args(argv)
    knobs.apply_cli_args(args)

    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import load_options
    from pgtformer_tpu.parallel.mesh import make_mesh, shard_batch
    from pgtformer_tpu.data.vfhq import VFHQTrainDataset
    from pgtformer_tpu.train.trainer import Trainer, epoch_repeat
    from pgtformer_tpu.train.lpips import make_lpips_fn
    from pgtformer_tpu.models.vae import TDCRQVAE3

    opt = load_options(args.options)
    stage = args.stage or detect_stage(opt, args.options)
    exp_dir = args.exp_dir or f"exp/{opt.get('name', 'run')}"

    n_dev = jax.device_count()
    if args.devices is not None:
        n_dev = min(n_dev, args.devices)
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    lpips_fn = None if args.no_lpips else make_lpips_fn(
        weights_path=args.lpips_weights)
    trainer, hp = build_from_options(
        opt, stage, args.data_root, mesh=mesh, lpips_fn=lpips_fn,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        use_pallas=args.pallas)

    ds_opt = opt.get("datasets", {}).get("train", {})
    batch_per_dev = args.batch_size or int(
        ds_opt.get("batch_size_per_gpu", 1))
    batch = batch_per_dev * max(n_dev, 1)
    dataset = VFHQTrainDataset(
        args.data_root, r=int(ds_opt.get("r", 1)),
        is_aligned=bool(ds_opt.get("is_aligned", False)),
        degradation=str(ds_opt.get("degradation", "blr")),
        use_hflip=bool(ds_opt.get("use_hflip", True)),
        output_dtype=args.batch_dtype)

    rng = jax.random.PRNGKey(int(opt.get("manual_seed", 0)))
    sample = dataset[0]

    from pgtformer_tpu.data.loader import PrefetchLoader
    num_workers = (args.num_workers if args.num_workers is not None
                   else int(ds_opt.get("num_worker_per_gpu", 4)))
    loader = PrefetchLoader(
        dataset, batch, shuffle=True,
        seed=int(opt.get("manual_seed", 0)),
        num_workers=num_workers, prefetch=args.prefetch,
        backend="sync" if num_workers == 0 else "thread",
        keys=("gt",) if stage == "I" else ("gt", "lq"),
        reseed_dataset=True)

    def host_batches():
        for b in loader:
            if stage == "I":
                yield b["gt"]
            else:
                yield {"lq": b["lq"], "gt": b["gt"]}

    if mesh is not None:
        put = lambda b: shard_batch(b, mesh)
    else:
        put = lambda b: jax.tree.map(jax.device_put, b)

    if args.upload_prefetch > 0:
        from pgtformer_tpu.data.loader import device_prefetch

        def iter_batches():
            # uploads run `upload_prefetch` batches ahead on a transfer
            # thread, overlapping host->device bytes with device compute
            yield from device_prefetch(host_batches(), put,
                                       depth=args.upload_prefetch)
    else:
        def iter_batches():
            for b in host_batches():
                yield put(b)

    # when a checkpoint will be auto-resumed, build only the ABSTRACT state
    # (jax.eval_shape): materializing the full init state on device and
    # then restoring a second copy doubles device memory and OOMs a 16GB
    # chip at 512px stage geometry
    from pgtformer_tpu.utils.checkpoint import CheckpointManager
    resuming = CheckpointManager(exp_dir).latest_step() is not None

    if stage == "I":
        def build_state():
            return trainer.init_state(
                rng, jnp.asarray(sample["gt"][None][:1].repeat(batch,
                                                               axis=0)))
    else:
        import os as _os
        from pgtformer_tpu.utils.checkpoint import (
            restore_export_host, merge_pretrained)
        teacher = TDCRQVAE3(trainer.cfg.vqvae)

        def as_float(a):   # samples may be uint8 (--batch-dtype)
            a = np.asarray(a)
            return (a.astype(np.float32) / 255.0
                    if a.dtype == np.uint8 else a)

        sample_gt1 = jnp.asarray(as_float(sample["gt"][None]))
        if args.teacher_ckpt and _os.path.isdir(args.teacher_ckpt):
            # orbax net_g export from a stage-I run (export payload:
            # params_ema + frozen collections)
            pre = restore_export_host(args.teacher_ckpt)
            t_vars = {"params": pre["params_ema"]}
            for col in ("codebook", "batch_stats"):
                if pre.get(col) is not None:
                    t_vars[col] = pre[col]
        elif args.teacher_ckpt:
            from pgtformer_tpu.convert.torch_port import (
                load_torch_checkpoint, port_torch_state_dict)
            shapes = jax.eval_shape(
                lambda: teacher.init({"params": jax.random.PRNGKey(0)},
                                     sample_gt1))
            zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
            t_vars = port_torch_state_dict(
                zeros, load_torch_checkpoint(args.teacher_ckpt))
        elif not resuming:
            print("WARNING: stage %s without --teacher-ckpt: random teacher"
                  % stage, file=sys.stderr)
            t_vars = teacher.init({"params": jax.random.PRNGKey(7)},
                                  sample_gt1)
        else:
            t_vars = jax.eval_shape(
                lambda: teacher.init({"params": jax.random.PRNGKey(7)},
                                     sample_gt1))

        def build_state():
            sample_batch = jnp.asarray(
                np.repeat(as_float(sample["lq"][None]), batch, axis=0))
            sv = None
            # skip the pretrained overlay when auto-resuming: build_state
            # then runs under jax.eval_shape (abstract), where a real orbax
            # restore would see tracers and crash — and the resumed
            # TrainState overwrites these values anyway
            if args.student_ckpt and not resuming:
                # reference `pretrain_network_g` + `strict_load_g: false`:
                # init the full student, then overlay every pretrained
                # tensor whose path+shape matches (stage I's TDCRQVAE3
                # covers encoder/decoder/quant_conv/codebook; stage II/III
                # exports cover everything)
                sv = jax.jit(lambda k: trainer.model.init(
                    {"params": k}, sample_batch[:1], w=1.0,
                    code_only=False))(jax.random.PRNGKey(11))
                pre = restore_export_host(args.student_ckpt)
                sv, n_loaded, skipped = merge_pretrained(sv, pre)
                print(f"student init: {n_loaded} tensors loaded from "
                      f"{args.student_ckpt}, {len(skipped)} pretrained "
                      "leaves without a destination (strict_load_g: false)")
            return trainer.init_state(rng, sample_batch, t_vars,
                                      student_variables=sv)

    state = jax.eval_shape(build_state) if resuming else build_state()

    if args.disc_ckpt and not resuming and getattr(state, "d", None) is not None:
        # reference `pretrain_network_d` + `strict_load_d: true`
        # (options/...stage_III...yml:143-145): overlay the carried
        # discriminator; tree.map enforces the strict structure match
        from pgtformer_tpu.utils.checkpoint import restore_export_host
        pre_d = restore_export_host(args.disc_ckpt)
        d_params = pre_d.get("params_ema") or pre_d.get("params")
        new_d = state.d.replace(params=jax.tree.map(
            lambda cur, new: np.asarray(new, cur.dtype),
            state.d.params, d_params))
        if (pre_d.get("batch_stats") is not None
                and getattr(state.d, "batch_stats", None) is not None):
            new_d = new_d.replace(batch_stats=jax.tree.map(
                lambda cur, new: np.asarray(new, cur.dtype),
                state.d.batch_stats, pre_d["batch_stats"]))
        state = state.replace(d=new_d)
        print(f"discriminator initialized from {args.disc_ckpt} "
              "(strict_load_d)")

    val_fn = None
    if args.val_data_root:
        from pgtformer_tpu.data.vfhq import VFHQTestDataset
        from pgtformer_tpu.train.validate import make_val_fn
        val_opt = opt.get("datasets", {}).get("val", {})
        val_ds = VFHQTestDataset(
            args.val_data_root, r=int(val_opt.get("r", ds_opt.get("r", 1))),
            is_aligned=bool(val_opt.get("is_aligned",
                                        ds_opt.get("is_aligned", False))),
            degradation=str(val_opt.get("degradation",
                                        ds_opt.get("degradation", "blr"))),
            inter_space=int(val_opt.get("inter_space", 1)))
        val_fn = make_val_fn(trainer, val_ds, stage,
                             max_samples=args.val_samples,
                             save_dir=f"{exp_dir}/visualization",
                             # stage II's config leaves w at the arch
                             # default 0 (reference stage-II yml has no
                             # `w:`): validating through w>0 would inject
                             # the UNTRAINED fuse blocks
                             w=float(getattr(trainer.cfg, "w", 1.0)))

    loop = Trainer(trainer, exp_dir,
                   print_freq=int(opt.get("logger", {}).get("print_freq", 100)),
                   save_checkpoint_freq=int(float(
                       opt.get("logger", {}).get("save_checkpoint_freq", 1e4))),
                   val_freq=int(float(opt.get("val", {}).get("val_freq", 2e4))))
    loop.fit(state, epoch_repeat(iter_batches),
             total_iter=args.total_iter or hp.total_iter, val_fn=val_fn)
    return 0


if __name__ == "__main__":
    sys.exit(main())
