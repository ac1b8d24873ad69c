"""Stage-2 runner: joint SVBRDF/normal/visibility/light training + eval modes.

Replaces stage2/trainer.py (TrainRunner) and stage2/eval.py (standard,
--render_envmap, material editing) with one object. Frame renders go through
the fused lax.map frame renderer (one launch per view instead of the
reference's 64-light x 1024-pixel nested loops).
"""

from __future__ import annotations

import dataclasses
import os
import time

import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.config import Stage2Config
from psnerf_tpu.core.spherical import gen_light_xyz
from psnerf_tpu.data.scene import load_scene_params
from psnerf_tpu.data.stage2 import (decode_imgs, load_stage2_data,
                                    sample_stage2_batch)
from psnerf_tpu.eval.frame import render_frame_stage2
from psnerf_tpu.fields.psnet import init_psnet
from psnerf_tpu.train.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from psnerf_tpu.train.stage2 import (
    init_stage2_params,
    light_direction_error_deg,
    make_stage2_train_step,
)

_to8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)


class Stage2Runner:
    def __init__(self, cfg: Stage2Config, workdir: str, seed: int = 0,
                 resume: bool = True, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'rays' axis — training goes
        data-parallel over the pixel axis (params + light tables replicated,
        batches sharded, gradient psum inserted by XLA over ICI). num_pixels
        must be divisible by the mesh size."""
        self.mesh = mesh
        self.cfg = cfg
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.scene = load_scene_params(cfg.data_dir)
        self.data = load_stage2_data(
            self.scene, cfg.stage1_shape_path, "train", cfg.inten_normalize,
            cfg.train_view, cfg.train_light, cfg.all_view,
            vis_loss=cfg.vis_loss, vis_plus=cfg.vis_plus,
            image_store=cfg.image_store,
        )
        self.n_views = len(self.data["views"])
        # ragged per-view light counts: the light axis is padded to the max;
        # light_count holds the real count per view
        self.light_count = np.asarray(self.data["light_count"])
        n_lights = int(self.light_count.min())
        self.light_bs = min(cfg.light_bs, n_lights)

        # ---- light table init (trainer.py:132-163) ----
        cnt = self.light_count
        if cfg.train.light_train and cfg.light_init == "pred":
            sdps_dir = self.scene.sdps_dir(cfg.inten_normalize, cfg.train_light)
            lp = np.load(os.path.join(sdps_dir, "light_direction_pred.npy"),
                         allow_pickle=True)[self.data["views"]]
            slt = self.data["light_slt"]
            dirs0 = np.concatenate([
                np.einsum("ij,kj->ki", self.data["pose_gl"][i, :3, :3],
                          np.asarray(lp[i])[slt[i, : cnt[i]]])
                for i in range(self.n_views)
            ]).astype(np.float32)
        else:  # 'gt' (or light_train off): dataset dirs
            dirs0 = np.concatenate(
                [np.asarray(self.data["light_dirs"][i][: cnt[i]])
                 for i in range(self.n_views)]
            ).astype(np.float32)
        if cfg.train.light_inten_train and cfg.light_inten_init == "pred":
            sdps_dir = self.scene.sdps_dir(cfg.inten_normalize, cfg.train_light)
            ip = np.load(os.path.join(sdps_dir, "light_intensity_pred.npy"),
                         allow_pickle=True)[self.data["views"]]
            slt = self.data["light_slt"]
            ints0 = np.concatenate([
                np.asarray(ip[i])[slt[i, : cnt[i]]] for i in range(self.n_views)
            ]).reshape(-1, 1).astype(np.float32)
        else:  # 'same'
            ints0 = np.full((len(dirs0), 1), cfg.net.light_int, np.float32)

        # initial (frozen) dirs drive the visibility-net inputs
        # (trainer.py:377); padded back to [V, Lmax, 3] (+z rows on padding)
        init_pad = np.zeros(
            (self.n_views, int(cnt.max()), 3), np.float32)
        init_pad[..., 2] = 1.0
        off = 0
        for i in range(self.n_views):
            d = dirs0[off:off + cnt[i]]
            init_pad[i, : cnt[i]] = d / np.linalg.norm(
                d, axis=-1, keepdims=True)
            off += cnt[i]
        self.light_init_dirs = jnp.asarray(init_pad)
        # unpadded GT dirs (flat table order) for light-error logging
        self._gt_dirs_flat = jnp.asarray(np.concatenate(
            [np.asarray(self.data["light_dirs"][i][: cnt[i]])
             for i in range(self.n_views)]).astype(np.float32))

        model = init_psnet(jax.random.PRNGKey(seed), cfg.net)
        self.params = init_stage2_params(model, dirs0, ints0)

        # milestones: epochs * dataset_len * light_bs (trainer.py:118-124);
        # when no epoch-unit schedule is configured, an iteration-unit
        # train.milestone_iters passed directly is respected as-is
        tcfg = cfg.train
        if cfg.sched_milestones_epochs:
            tcfg = dataclasses.replace(
                tcfg,
                milestone_iters=tuple(
                    int(m) * self.n_views * self.light_bs
                    for m in cfg.sched_milestones_epochs
                ),
            )
        self.tcfg = tcfg
        init_opt, self.step_fn = make_stage2_train_step(cfg.net, tcfg)
        self.opt_state = init_opt(self.params)
        self.it = 0
        self.key = jax.random.PRNGKey(seed + 1)

        self.ckpt_dir = os.path.join(workdir, "checkpoints")
        if resume:
            ck = latest_checkpoint(self.ckpt_dir)
            if ck:
                tree = {"params": self.params, "opt": self.opt_state}
                tree, scalars = load_checkpoint(ck, tree)
                self.params, self.opt_state = tree["params"], tree["opt"]
                self.it = int(scalars.get("it", 0))
                print(f"resumed from {ck} at it={self.it}")

        from psnerf_tpu.train.logging import MetricLogger

        self.logger = MetricLogger(os.path.join(workdir, "metrics.jsonl"))

        num_pixels = cfg.num_pixels
        total = self.data["imgs"].shape[2]
        if cfg.train_all_pixels:
            num_pixels = total
        self.num_pixels = min(num_pixels, total)
        # device-resident dataset arrays are passed as jit ARGUMENTS — closing
        # over them would bake hundreds of MB of constants into the program
        # (the remote compiler rejects the oversized HLO at 256^2 scale)
        self._device_data = {k: v for k, v in self.data.items()
                             if isinstance(v, jnp.ndarray)}
        static_data = {k: v for k, v in self.data.items()
                       if not isinstance(v, jnp.ndarray)}
        use_vp = cfg.vis_plus and "vis_plus" in self.data
        if mesh is not None:
            from psnerf_tpu.parallel import replicate

            n_dev = mesh.devices.size
            assert self.num_pixels % n_dev == 0, (
                f"num_pixels={self.num_pixels} not divisible by the "
                f"{n_dev}-device mesh")
            self.params = replicate(self.params, mesh)
            self.opt_state = replicate(self.opt_state, mesh)
            self.key = replicate(self.key, mesh)
            self._device_data = replicate(self._device_data, mesh)
            self.light_init_dirs = replicate(self.light_init_dirs, mesh)

        def _sample_impl(dd, init_dirs, view, key):
            return sample_stage2_batch(
                {**dd, **static_data}, view, key, self.num_pixels,
                self.light_bs, sample_in_mask=cfg.sample_in_mask,
                vis_train_num=cfg.vis_train_num,
                light_init_dirs=init_dirs if use_vp else None,
            )

        self._sample_jit = jax.jit(_sample_impl, static_argnums=(2,))
        self._sample = lambda view, key: self._sample_jit(
            self._device_data, self.light_init_dirs, view, key)

        # "megastep": K full train iterations (view draw + batch sample +
        # step) scanned inside ONE device dispatch — the per-iteration host
        # round trips otherwise dominate (the jitted step itself is ~6 ms at
        # the demo config; the single-step loop measured ~89 ms/it). The
        # sampler works with a TRACED view (all per-view arrays are padded
        # and stacked), so the whole body is scannable.
        def _mega_impl(dd, init_dirs, params, opt_state, key, it0, n_steps):
            def body(carry, i):
                params, opt_state, key = carry
                key, k1, k2 = jax.random.split(key, 3)
                view = jax.random.randint(k1, (), 0, self.n_views)
                batch = _sample_impl(dd, init_dirs, view, k2)
                if self.mesh is not None:
                    from psnerf_tpu.parallel import constrain_stage2_batch

                    batch = constrain_stage2_batch(batch, self.mesh)
                if not use_vp:
                    # no vis_plus: supervise vis_train on the stage-1
                    # visibility of this step's lights, frozen init dirs in
                    batch["light_vis_train"] = init_dirs[view][batch["lidx"]]
                params, opt_state, terms = self.step_fn(
                    params, opt_state, batch,
                    (it0 + i).astype(jnp.float32), k2,
                )
                return (params, opt_state, key), terms

            (params, opt_state, key), terms = jax.lax.scan(
                body, (params, opt_state, key), jnp.arange(n_steps))
            return params, opt_state, key, terms

        self._mega_jit = jax.jit(_mega_impl, static_argnums=(6,))

    # ------------------------------------------------------------- training
    def train(self, max_iters: int, log_every: int = 100,
              ckpt_every: int | None = None, on_log=None,
              wall_budget_s: float | None = None,
              plot_every: int | None = None):
        """plot_every: write a train+test comparison grid every N iterations
        (the reference's plot_to_disk cadence, stage2/trainer.py:358-360)."""
        ckpt_every = ckpt_every or self.cfg.ckpt_freq
        t_start = time.time()
        t0 = time.time()
        while self.it < max_iters:
            if wall_budget_s is not None and time.time() - t_start > wall_budget_s:
                self.save(self.it)
                print(f"[stage2] wall budget reached at it={self.it}; "
                      "checkpointed for resume")
                return self
            if plot_every and self.it > 0 and self.it % plot_every == 0:
                self.plot_to_disk(os.path.join(
                    self.workdir, "plots", f"it_{self.it}.png"))
            # chunk of steps in one dispatch, stopping at every cadence
            # boundary so logging/ckpt/plot behavior matches the single-step
            # loop exactly
            bounds = [max_iters, self.it + 100]
            for every in (log_every, ckpt_every, plot_every or 0):
                if every:
                    bounds.append((self.it // every + 1) * every)
            if self.it < self.tcfg.warmup_iters:
                bounds.append(self.tcfg.warmup_iters)
            n_steps = max(1, min(bounds) - self.it)
            self.params, self.opt_state, self.key, terms_seq = self._mega_jit(
                self._device_data, self.light_init_dirs, self.params,
                self.opt_state, self.key, self.it, n_steps,
            )
            self.it += n_steps
            if self.it % log_every == 0:
                losses = np.asarray(terms_seq["loss"])
                terms = {k: float(v[-1]) for k, v in terms_seq.items()}
                if not np.isfinite(losses).all():
                    bad = int(np.argmax(~np.isfinite(losses)))
                    raise FloatingPointError(
                        f"non-finite loss at it={self.it - n_steps + bad + 1}:"
                        f" {terms}")
                mse2psnr = lambda x: -10.0 * np.log(x + 1e-8) / np.log(10.0)
                lderr = float(light_direction_error_deg(
                    self.params["light_dirs"], self._gt_dirs_flat))
                dt = time.time() - t0
                print(f"[stage2 it {self.it}] loss={terms['loss']:.5f} "
                      f"rgb={terms['sg_rgb_loss']:.5f} "
                      f"psnr={mse2psnr(terms['sg_rgb_loss']):.2f} "
                      f"vis={terms.get('vis_loss', 0.0):.4f} "
                      f"normal={terms.get('normal_loss', 0.0):.4f} "
                      f"ld_err={lderr:.2f}deg "
                      f"{log_every / dt:.1f} it/s")
                terms["light_direction_error"] = lderr
                self.logger.log(self.it, terms)
                if on_log:
                    on_log(self.it, terms)
                t0 = time.time()
            if self.it % ckpt_every == 0 or self.it == max_iters:
                self.save(self.it)
        return self

    def save(self, it: int, backup_every_n_ckpts: int = 10):
        """Rolling latest + sparse numbered backups (the reference keeps a
        pruned history of numbered checkpoints, trainer.py:466-481)."""
        tree = {"params": self.params, "opt": self.opt_state}
        save_checkpoint(os.path.join(self.ckpt_dir, "model.npz"), tree,
                        {"it": it})
        if it > 0 and it % (self.cfg.ckpt_freq * backup_every_n_ckpts) == 0:
            save_checkpoint(os.path.join(self.ckpt_dir, f"model_{it}.npz"),
                            tree, {"it": it})

    def plot_to_disk(self, out_path: str, train_view: int = 0,
                     light: int = 0, tile: int = 4096):
        """Train-view + test-view comparison grid (pred | gt | normal) with
        PSNR / normal-MAE printed, as the reference's plot_to_disk
        (stage2/trainer.py:278-346)."""
        from psnerf_tpu.eval.metrics import mae, psnr

        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        rows, stats = [], {}
        for split, view in (("train", train_view), ("test", 0)):
            try:
                data = self._eval_data(split)
            except FileNotFoundError:
                continue
            dirs, ints = self.trained_lights_for_view(data, view)
            r = self.render_view(data, view, dirs[:max(light + 1, 1)],
                                 ints[:max(light + 1, 1)], tile,
                                 outputs=("rgb", "normal_pred"))
            h, w = data["img_res"]
            pred = r["rgb"][light]
            gt = np.asarray(decode_imgs(data["imgs"][view][light])).reshape(
                h, w, 3)
            gt = gt + (1.0 - r["mask"][..., None])  # white bg like pred
            normal = r.get("normal_pred",
                           r["normal_values"][None])[..., :3].reshape(h, w, 3)
            rows.append(np.concatenate(
                [pred, gt, normal / 2 + 0.5], axis=1))
            m = r["mask"] & (np.asarray(data["object_masks"][view])
                             .reshape(h, w))
            stats[f"{split}_psnr"] = round(psnr(pred, gt, m), 2)
            gt_n = np.asarray(data["gt_normal"][view]).reshape(h, w, 3)
            if np.abs(gt_n).sum() > 0:
                stats[f"{split}_normal_mae"] = round(
                    mae(normal, gt_n, m)[0], 2)
        imageio.imwrite(out_path, _to8(np.concatenate(rows, axis=0)))
        self.logger.log(self.it, stats)
        print(f"[stage2 plot] {out_path} {stats}")
        return stats

    # ------------------------------------------------------------ rendering
    def _eval_data(self, split: str):
        if split == "train":
            return self.data
        cache = getattr(self, "_eval_data_cache", None)
        if cache is None:
            cache = self._eval_data_cache = {}
        if split not in cache:
            cache[split] = load_stage2_data(
                self.scene, self.cfg.stage1_shape_path, split,
                self.cfg.inten_normalize, self.cfg.train_view,
                self.cfg.train_light, self.cfg.all_view,
                vis_loss=False, vis_plus=False,
                image_store=self.cfg.image_store,
            )
        return cache[split]

    def render_view(self, data, view: int, light_dirs, light_ints,
                    tile: int = 4096, outputs=("rgb", "albedo", "rough",
                                               "visibility", "normal_pred"),
                    use_fused_vis: bool | None = None,
                    compact: bool | None = None,
                    albedo_new=None, basis_new: int | None = None):
        """All lights x all pixels of one view, single fused launch.

        use_fused_vis: route the visibility MLP through the Pallas kernel
        (auto: on TPU when the light count fits one kernel launch; larger
        light sets — envmap relighting — are chunked by the caller).
        compact: render only the surface-mask pixels (padded to the tile)
        and scatter the results back with the reference's fill values —
        object masks typically cover 25-50%% of the frame, so this cuts the
        per-frame kernel work 2-4x. Auto: on when mask coverage < 0.6.
        Per-pixel math is independent, so outputs are identical."""
        if use_fused_vis is None:
            use_fused_vis = (jax.default_backend() == "tpu"
                             and self.cfg.net.visibility
                             and len(light_dirs) <= 128)
        h, w = data["img_res"]
        n = h * w
        mask_np = np.asarray(data["surface_mask"][view]).reshape(-1) > 0
        if compact is None:
            compact = mask_np.mean() < 0.6
        ys, xs = np.mgrid[0:h, 0:w]
        uv = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)

        if compact:
            sel = np.where(mask_np)[0]
            n_out = sel.shape[0]
            pad = (-n_out) % tile
            sel_pad = np.concatenate([sel, np.zeros((pad,), sel.dtype)])
            sel_dev = jnp.asarray(sel_pad)
            gather = lambda x, fill=None: jnp.asarray(x)[sel_dev]
            uv_in = jnp.asarray(uv)[sel_dev]
            mask_in = jnp.ones((n_out + pad,), bool)
        else:
            n_out = n
            pad = (-n) % tile

            def gather(x, fill=0.0):
                # stays on device: np.asarray here would round-trip the
                # arrays through the host (catastrophic over a tunnel)
                x = jnp.asarray(x)
                if pad == 0:
                    return x
                widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                return jnp.pad(x, widths, constant_values=fill)

            uv_in = gather(uv)
            mask_in = gather(data["surface_mask"][view], False)

        cfg = self.cfg.net
        avail = {"rgb", "rgb_sum", "albedo", "rough", "sg_weight",
                 "visibility"}
        if cfg.normal_mlp:
            avail.add("normal_pred")
        if not cfg.visibility:
            avail.discard("visibility")
        outs = tuple(o for o in outputs if o in avail)
        # cache compiled renderers by (tile, outputs) — a fresh jit closure
        # per view would recompile every call
        cache = getattr(self, "_frame_fns", None)
        if cache is None:
            cache = self._frame_fns = {}
        # edit hooks are baked into the compiled closure -> part of the key
        edit_key = (None if albedo_new is None
                    else tuple(np.asarray(albedo_new, np.float32).tolist()),
                    basis_new)
        key = (tile, outs, use_fused_vis, edit_key)
        if key not in cache:
            if self.mesh is not None:
                # multi-chip eval: each device renders its pixel shard (the
                # fused kernels run per device inside the shard_map)
                from psnerf_tpu.parallel.sharded_render import (
                    make_sharded_frame_renderer,
                )

                n_dev = self.mesh.devices.size
                assert tile % n_dev == 0, (
                    f"tile={tile} not divisible by the {n_dev}-device mesh")
                cache[key] = make_sharded_frame_renderer(
                    cfg, self.mesh, tile=tile // n_dev, outputs=outs,
                    use_fused_vis=use_fused_vis,
                    albedo_new=albedo_new, basis_new=basis_new)
            else:
                cache[key] = jax.jit(
                    lambda p, uvp, pose, K, pts, nrm, msk, ld, li:
                    render_frame_stage2(p, cfg, uvp, pose, K, pts, nrm, msk,
                                        ld, li, tile=tile, outputs=outs,
                                        use_fused_vis=use_fused_vis,
                                        albedo_new=albedo_new,
                                        basis_new=basis_new)
                )
        out = cache[key](
            self.params["model"], uv_in, data["poses"][view], data["K"],
            gather(data["points"][view]), gather(data["normals"][view]),
            mask_in,
            jnp.asarray(light_dirs), jnp.asarray(light_ints),
        )
        out = jax.device_get(out)
        res = {}
        # reference fill values outside the surface mask (render_psnet):
        # ones everywhere except sg_weight; rgb_sum's per-light ones sum to L
        fills = {"sg_weight": 0.0, "rgb_sum": float(len(light_dirs))}
        for k, v in out.items():
            if compact:
                full_shape = ((v.shape[0], n) + v.shape[2:] if v.ndim == 3
                              else (n,) + v.shape[1:])
                full = np.full(full_shape, fills.get(k, 1.0), v.dtype)
                if v.ndim == 3:
                    full[:, sel] = v[:, :n_out]
                else:
                    full[sel] = v[:n_out]
                v = full
            if v.ndim == 3:  # [L, N(+pad), C]
                res[k] = v[:, :n].reshape(v.shape[0], h, w, -1)
            else:
                res[k] = v[:n].reshape(h, w, -1)
        res["mask"] = mask_np.reshape(h, w)
        res["normal_values"] = np.asarray(
            data["normals"][view]).reshape(h, w, 3)
        return res

    def trained_lights_for_view(self, data, view: int):
        """Trained light table rows for a view (falls back to dataset dirs
        when the split's views were not trained)."""
        cfg = self.cfg
        vi = data["views"][view]
        if cfg.train.light_train and vi in set(self.data["views"].tolist()):
            local = int(np.where(self.data["views"] == vi)[0][0])
            off = self.data["light_row_offset"][local]
            ln = int(self.data["light_count"][local])
            dirs = np.asarray(self.params["light_dirs"][off:off + ln])
            # np.asarray of a jax array is read-only: no in-place ops
            dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
            ints = np.asarray(self.params["light_ints"][off:off + ln, 0])
            return dirs, ints
        ln = int(data["light_count"][view])
        dirs = np.asarray(data["light_dirs"][view][:ln])
        ints = np.full((dirs.shape[0],), cfg.net.light_int, np.float32)
        return dirs, ints

    # ----------------------------------------------------------- eval modes
    def evaluate(self, out_dir: str, split: str = "test", tile: int = 4096,
                 save_npy: bool = True):
        """Standard eval: per test view, every light (stage2/eval.py:314-417
        output contract: rgb/img/view_XX/LLL.png, mask/img, normal/npy ...)."""
        data = self._eval_data(split)
        for sub in ["rgb", "normal", "albedo", "rough", "mask", "visibility"]:
            os.makedirs(os.path.join(out_dir, sub, "img"), exist_ok=True)
            os.makedirs(os.path.join(out_dir, sub, "npy"), exist_ok=True)
        for v, vi in enumerate(data["views"]):
            dirs, ints = self.trained_lights_for_view(data, v)
            r = self.render_view(data, v, dirs, ints, tile)
            name = f"view_{vi + 1:02d}"
            rgb_dir = os.path.join(out_dir, "rgb", "img", name)
            os.makedirs(rgb_dir, exist_ok=True)
            for li in range(r["rgb"].shape[0]):
                imageio.imwrite(os.path.join(rgb_dir, f"{li + 1:03d}.png"),
                                _to8(r["rgb"][li]))
            if "visibility" in r:
                vdir = os.path.join(out_dir, "visibility", "img", name)
                os.makedirs(vdir, exist_ok=True)
                for li in range(r["visibility"].shape[0]):
                    imageio.imwrite(
                        os.path.join(vdir, f"{li + 1:03d}.png"),
                        _to8(np.repeat(r["visibility"][li], 3, -1)))
            if "rough" in r:
                rdir = os.path.join(out_dir, "rough", "img", name)
                os.makedirs(rdir, exist_ok=True)
                for li in range(r["rough"].shape[0]):
                    imageio.imwrite(os.path.join(rdir, f"{li + 1:03d}.png"),
                                    _to8(r["rough"][li]))
            mask = r["mask"]
            imageio.imwrite(os.path.join(out_dir, "mask", "img", name + ".png"),
                            _to8(mask.astype(np.float64)))
            normal = (r.get("normal_pred", r["normal_values"])
                      .reshape(*mask.shape, 3) * mask[..., None])
            np.save(os.path.join(out_dir, "normal", "npy", name + ".npy"),
                    normal.astype(np.float32))
            imageio.imwrite(os.path.join(out_dir, "normal", "img", name + ".png"),
                            _to8(normal / 2 + 0.5))
            imageio.imwrite(os.path.join(out_dir, "albedo", "img", name + ".png"),
                            _to8(r["albedo"].reshape(*mask.shape, 3)))
            if save_npy:
                np.save(os.path.join(out_dir, "rgb", "npy", name + ".npy"),
                        r["rgb"].astype(np.float32))
                np.save(os.path.join(out_dir, "mask", "npy", name + ".npy"),
                        mask.astype(bool))
                np.save(os.path.join(out_dir, "albedo", "npy", name + ".npy"),
                        r["albedo"].astype(np.float32))
                if "rough" in r:
                    np.save(os.path.join(out_dir, "rough", "npy",
                                         name + ".npy"),
                            r["rough"].astype(np.float32))
                if "visibility" in r:
                    # eval.py:406 clips the visibility artifact to [0,1]
                    # (the raw MLP output can dip below 0 off-shadow)
                    np.save(os.path.join(out_dir, "visibility", "npy",
                                         name + ".npy"),
                            r["visibility"][..., 0].clip(0, 1)
                            .astype(np.float32))

    def render_envmap(self, out_dir: str, envmap: np.ndarray,
                      split: str = "test", light_h: int = 16,
                      gamma: float = 1.0, envmap_scale: float = 1.0,
                      tile: int = 4096):
        """Relight under a lat-long envmap: 2*light_h^2 directional lights,
        per-light intensity = texel rgb, SUM over lights, tonemap
        (stage2/eval.py:173-231). envmap: [light_h, 2*light_h, 3]."""
        from psnerf_tpu.core.spherical import vis_light_probe

        data = self._eval_data(split)
        lxyz, _ = gen_light_xyz(light_h, 2 * light_h, envmap_radius=1.0)
        dirs = lxyz.reshape(-1, 3)
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        texels = envmap.reshape(-1, 3).astype(np.float32) * envmap_scale
        os.makedirs(os.path.join(out_dir, "rgb", "img"), exist_ok=True)
        imageio.imwrite(os.path.join(out_dir, "light_probe.png"),
                        vis_light_probe(envmap * envmap_scale, light_h * 8))
        for v, vi in enumerate(data["views"]):
            # per-light per-CHANNEL intensity = envmap texel (eval.py:202);
            # sum over the light axis, clip, tonemap (eval.py:218-220).
            # lights are processed in <=128 chunks so the fused visibility
            # kernel applies (512 envmap lights = 4 launches); partial sums
            # accumulate on host, bounding memory
            acc = 0.0
            chunk = 128
            for s in range(0, len(dirs), chunk):
                r = self.render_view(data, v, dirs[s:s + chunk],
                                     texels[s:s + chunk], tile,
                                     outputs=("rgb_sum",))
                acc = acc + r["rgb_sum"]
            acc = np.clip(acc, 0, 1)  # r["mask"] identical across chunks
            img = np.power(acc, 1.0 / gamma)
            mask = r["mask"][..., None]
            img = img * mask + (1 - mask)
            imageio.imwrite(
                os.path.join(out_dir, "rgb", "img", f"view_{vi + 1:02d}.png"),
                _to8(img))
        return out_dir

    def edit_material(self, out_dir: str, split: str = "test",
                      albedo_new=None, basis_new: int | None = None,
                      tile: int = 4096):
        """Material editing (stage2/eval.py:233-312): albedo override and/or
        single-SG-basis swap, rendered under the trained lights through the
        SAME tiled frame renderer as standard eval (the reference's edit loop
        reuses its split_input chunking, eval.py:278; a monolithic
        all-lights x all-pixels launch OOMs at 512^2 x 96 lights)."""
        data = self._eval_data(split)
        os.makedirs(os.path.join(out_dir, "rgb", "img"), exist_ok=True)
        for v, vi in enumerate(data["views"]):
            dirs, ints = self.trained_lights_for_view(data, v)
            h, w = data["img_res"]

            out = self.render_view(data, v, dirs, ints, tile=tile,
                                   outputs=("rgb",),
                                   albedo_new=albedo_new,
                                   basis_new=basis_new)
            rgb = np.asarray(out["rgb"]).reshape(-1, h, w, 3)
            vdir = os.path.join(out_dir, "rgb", "img", f"view_{vi + 1:02d}")
            os.makedirs(vdir, exist_ok=True)
            for li in range(rgb.shape[0]):
                imageio.imwrite(os.path.join(vdir, f"{li + 1:03d}.png"),
                                _to8(rgb[li]))
        return out_dir

def load_envmap(path: str, light_h: int = 16) -> np.ndarray:
    """Load + resize an envmap to [light_h, 2*light_h, 3]
    (stage2/utils/eval_utils.py:11-40). Formats: .hdr (Radiance RGBE),
    .png, .npy float32. NOTE: this image's OpenCV build has no OpenEXR
    codec — convert .exr maps to .hdr or .npy
    (e.g. `oiiotool in.exr -o out.hdr`, or any numpy exporter)."""
    import cv2

    if path.endswith(".npy"):
        img = np.load(path).astype(np.float32)
        return cv2.resize(img, (2 * light_h, light_h),
                          interpolation=cv2.INTER_AREA)
    img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    if img is None:
        raise FileNotFoundError(
            f"could not read {path} (EXR is unsupported by this OpenCV "
            "build; use .hdr/.npy)")
    if img.ndim == 3:
        img = img[..., ::-1]  # BGR -> RGB
    else:
        img = np.repeat(img[..., None], 3, -1)
    img = img.astype(np.float32)
    if path.endswith(".png"):
        img = img / 255.0
    return cv2.resize(img, (2 * light_h, light_h),
                      interpolation=cv2.INTER_AREA)
