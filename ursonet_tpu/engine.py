"""The train/infer engine — TPU-native equivalent of the reference
`net.UrsoNet` class (net.py:566-1308).

Responsibilities (mirroring the reference method-for-method):
  * build()            — Flax module + device mesh + optimizer
  * load_weights()     — msgpack snapshots or Keras h5 (by-name, exclude)
  * find_last()        — resume discovery contract
  * train()            — epoch loop with layer-freezing presets, per-epoch
                         atomic checkpoints, validation, JSONL metrics
  * mold_inputs()/detect() — batched jit inference

TPU-first internals: one jitted XLA program per train step (on-device
augmentation fused in), batch sharded over the 'data' mesh axis, head
kernels optionally sharded over 'model'; bf16 compute under F16.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ursonet_tpu import checkpoint as ckpt
from ursonet_tpu import parallel
from ursonet_tpu.checkpoint import h5_import
from ursonet_tpu.data import loader as data_loader
from ursonet_tpu.models.ursonet import build_model
from ursonet_tpu.ops import image as imops
from ursonet_tpu.train.optim import make_optimizer
from ursonet_tpu.train.state import (TrainState, create_train_state,
                                     state_from_params, trainable_mask)
from ursonet_tpu.train.step import (make_eval_step, make_predict_fn,
                                    make_train_step)


class UrsoNet:
    """Engine facade (reference net.UrsoNet, net.py:566)."""

    def __init__(self, mode: str, config, model_dir: str):
        assert mode in ('training', 'inference')
        self.mode = mode
        self.config = config
        self.model_dir = model_dir
        self.epoch = 0
        self.set_log_dir()
        self.build()

    # -- graph/build ---------------------------------------------------------

    def build(self):
        from ursonet_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        self.model = build_model(self.config)
        self.mesh = parallel.make_mesh(self.config)
        self.tx = make_optimizer(self.config)
        self.state: Optional[TrainState] = None
        self._predict = make_predict_fn(self.model, self.config)
        self._qmodel = None
        if self.config.DEBUG_NANS:
            jax.config.update('jax_debug_nans', True)

    def _sample_images(self):
        h, w, c = (int(x) for x in self.config.IMAGE_SHAPE)
        return jnp.zeros((self.config.BATCH_SIZE, h, w, c), jnp.float32)

    def initialize(self, seed: Optional[int] = None):
        """Random-init a sharded TrainState."""
        seed = self.config.SEED if seed is None else seed
        self._qmodel = None  # any quantized model derives from old weights
        self.state = create_train_state(
            self.model, self.config, self.tx, self.mesh,
            jax.random.PRNGKey(seed), self._sample_images())
        return self.state

    # -- bookkeeping ---------------------------------------------------------

    @property
    def _orbax(self) -> bool:
        return getattr(self.config, 'CHECKPOINT_FORMAT',
                       'msgpack') == 'orbax'

    def set_log_dir(self, weights_path: Optional[str] = None):
        """Run-dir + checkpoint template + epoch counter
        (reference net.py:944-967)."""
        ext = '.orbax' if self._orbax else '.msgpack'
        self.log_dir, self.checkpoint_path, self.epoch = ckpt.set_log_dir(
            self.model_dir, self.config.NAME, weights_path, ext=ext)

    def find_last(self) -> str:
        return ckpt.find_last(self.model_dir)

    def get_last_checkpoint(self, model_name: str) -> str:
        return ckpt.get_last_checkpoint(self.model_dir, model_name)

    # -- weights -------------------------------------------------------------

    def load_weights(self, path: str, exclude: Sequence[str] = (),
                     verbose: bool = False):
        """Load weights from a msgpack snapshot or a Keras h5 file, by
        name with optional layer exclusion (reference net.py:816-852)."""
        if self.state is None:
            self.initialize()
        if path.endswith('.h5'):
            params, batch_stats, report = h5_import.load_keras_h5(
                path, jax.device_get(self.state.params),
                jax.device_get(self.state.batch_stats),
                exclude=exclude, verbose=verbose)
        else:
            if path.endswith('.orbax'):
                from ursonet_tpu.checkpoint import orbax_store
                tree = orbax_store.load_weights_dir(path)
            else:
                tree = ckpt.load_weights_file(path)
            params, loaded, skipped = ckpt.merge_params(
                jax.device_get(self.state.params), tree['params'], exclude)
            batch_stats = self.state.batch_stats
            if tree.get('batch_stats') is not None \
                    and batch_stats is not None:
                batch_stats, _, _ = ckpt.merge_params(
                    jax.device_get(batch_stats), tree['batch_stats'],
                    exclude)
            if verbose:
                print(f"loaded {len(loaded)} layers, skipped {skipped}")
        self._set_weights(params, batch_stats)
        self.set_log_dir(path)
        return self.state

    def _set_weights(self, params, batch_stats):
        """Install host weight trees into a fresh sharded state."""
        self._qmodel = None  # quantized model derives from old weights
        var_sh = parallel.variable_shardings(
            self.mesh, jax.eval_shape(
                lambda r: self.model.init(r, self._sample_images()[:1],
                                          training=False),
                jax.random.PRNGKey(0)))
        params = dict(params)
        aux = params.pop('loss_log_vars', None)
        params = jax.device_put(params, var_sh['params'])
        if aux is not None:
            params['loss_log_vars'] = jax.device_put(
                aux, parallel.replicated(self.mesh))
        if batch_stats is not None and var_sh.get('batch_stats') is not None:
            batch_stats = jax.device_put(batch_stats, var_sh['batch_stats'])
        step = self.state.step if self.state is not None else 0
        self.state = state_from_params(params, batch_stats, self.tx,
                                       step=int(step))

    def save_weights(self, path: str):
        if path.endswith('.orbax'):
            from ursonet_tpu.checkpoint import orbax_store
            orbax_store.save_weights_dir(path, self.state.params,
                                         self.state.batch_stats)
        else:
            ckpt.save_weights_file(path, self.state.params,
                                   self.state.batch_stats)

    def resume_state(self, run_dir: Optional[str] = None) -> bool:
        """Exact-resume from `state_latest.msgpack` if present (improves on
        the reference's weights-only resume). Returns True on success."""
        run_dir = run_dir or self.log_dir
        path = os.path.join(run_dir, 'state_latest.orbax')
        if os.path.exists(path):
            from ursonet_tpu.checkpoint import orbax_store
            tree = orbax_store.load_state_dir(path)
        else:
            path = os.path.join(run_dir, 'state_latest.msgpack')
            if not os.path.exists(path):
                return False
            tree = ckpt.load_state(path)
        if self.state is None:
            self.initialize()
        from flax import serialization
        opt_state = serialization.from_state_dict(
            self.tx.init(jax.device_get(self.state.params)),
            tree['opt_state'])
        self._set_weights(tree['params'], tree['batch_stats'])
        self.state = self.state.replace(
            step=jnp.asarray(tree['step'], jnp.int32), opt_state=opt_state)
        self.epoch = int(tree['epoch'])
        self.log_dir = run_dir
        return True

    # -- training ------------------------------------------------------------

    def train(self, train_dataset, val_dataset, learning_rate: float,
              epochs: int, layers: str = 'all',
              log_fn=print) -> dict:
        """Epoch loop (reference net.py:1068-1167).

        layers: preset name (heads/3+/4+/5+/all) or a layer-name regex.
        Returns the final epoch's metric means.
        """
        assert self.mode == 'training', "Create model in training mode."
        # Training replaces the weights every step — a previously built
        # quantized serving model would silently serve the old ones.
        self._qmodel = None
        cfg = self.config
        if learning_rate is not None and learning_rate != cfg.LEARNING_RATE:
            cfg.LEARNING_RATE = learning_rate
            self.tx = make_optimizer(cfg)
            if self.state is not None:
                self.state = self.state.replace(
                    opt_state=self.tx.init(self.state.params))
        if self.state is None:
            self.initialize()

        from ursonet_tpu.utils.memory import check_train_memory
        check_train_memory(cfg, log_fn=log_fn)

        mask = trainable_mask(jax.device_get(self.state.params), layers)
        preprocess = None
        raw = bool(getattr(cfg, 'AUGMENT_ON_DEVICE', False))
        if raw:
            preprocess = data_loader.make_device_preprocess(
                cfg, train_dataset)

        # Multi-host: every process runs this same loop; each loads only
        # its slice of every (deterministically composed) global batch
        # (parallel/multihost.py). Process 0 owns file writes.
        mh = jax.process_count() > 1
        p0 = jax.process_index() == 0
        bslice = None
        if mh:
            from ursonet_tpu.parallel import multihost
            bslice = multihost.local_batch_slice(self.mesh, cfg.BATCH_SIZE)

        # Small datasets live device-resident: one bulk upload, zero
        # per-step host->device transfers (train/step resident steps).
        resident = data_loader.use_resident(train_dataset, cfg)
        train_gen = val_gen = None
        res_train = res_val = None
        if resident:
            from ursonet_tpu.train.step import (make_resident_eval_step,
                                                make_resident_train_step)
            bsh = parallel.batch_sharding(self.mesh) \
                if self.mesh.size > 1 else None
            rep = parallel.replicated(self.mesh)
            res_train, n_train = data_loader.load_dataset_resident(
                train_dataset, cfg, self.mesh)
            train_step = make_resident_train_step(
                self.model, cfg, self.tx, n_train, trainable=mask,
                preprocess=preprocess, batch_sharding=bsh)
            # All small step inputs ride replicated on the mesh: a
            # single-device (uncommitted) perm/counter/key would make
            # XLA reshard inside the step program (CPU in-process
            # collectives deadlock on that pattern).
            perm_fn = jax.jit(
                lambda k: jax.random.permutation(k, n_train),
                out_shardings=rep)
            if val_dataset is not None:
                res_val, n_val = data_loader.load_dataset_resident(
                    val_dataset, cfg, self.mesh)
                eval_step = make_resident_eval_step(
                    self.model, cfg, n_val, preprocess=preprocess,
                    batch_sharding=bsh)
            log_fn(f"data: device-resident ({n_train} train"
                   + (f" + {n_val} val" if res_val is not None else "")
                   + " images)")
        else:
            train_step = make_train_step(self.model, cfg, self.tx,
                                         trainable=mask,
                                         preprocess=preprocess)
            eval_step = make_eval_step(self.model, cfg,
                                       preprocess=preprocess)
            train_gen = data_loader.Prefetcher(data_loader.data_generator(
                train_dataset, cfg, shuffle=True,
                batch_size=cfg.BATCH_SIZE, seed=cfg.SEED, raw=raw,
                batch_slice=bslice))
            val_gen = data_loader.Prefetcher(data_loader.data_generator(
                val_dataset, cfg, shuffle=True, batch_size=cfg.BATCH_SIZE,
                seed=cfg.SEED + 1, raw=raw, batch_slice=bslice)) \
                if val_dataset is not None else None

        if p0:  # process-0-writes policy (run dir incl.)
            os.makedirs(self.log_dir, exist_ok=True)
            cfg.write_to_file(os.path.join(
                self.log_dir, f"config_{self.epoch}.json"))
        metrics_path = os.path.join(self.log_dir, 'metrics.jsonl')
        key = jax.random.PRNGKey(cfg.SEED)
        last_means = {}

        log_every = int(getattr(cfg, 'LOG_EVERY_STEPS', 0) or 0)
        # Metric sums accumulate ON DEVICE; fetching scalars per step
        # would sync the host into every step and stall the dispatch
        # pipeline (a ~15% throughput hit through the remote tunnel).
        acc = jax.jit(lambda s, m: jax.tree.map(jnp.add, s, m))
        # XLA:CPU's in-process collectives deadlock when many multi-device
        # executions are queued without a sync (rendezvous threads from
        # different executions interleave) — throttle dispatch depth on
        # the CPU backend (virtual-mesh tests). Real TPU keeps the fully
        # async pipeline (a per-step sync costs ~39% through the remote
        # tunnel, PERF.md).
        throttle = jax.default_backend() == 'cpu' and self.mesh.size > 1
        base_key = jax.random.PRNGKey(cfg.SEED + (1 << 20))
        if resident:
            rep = parallel.replicated(self.mesh)
            base_key = jax.device_put(np.asarray(base_key), rep)
            zero = jax.device_put(np.zeros((), np.int32), rep)
        with self.mesh:
            for epoch in range(self.epoch, epochs):
                t0 = time.time()
                sums, n = None, 0
                if resident:
                    key, pk = jax.random.split(key)
                    perm = perm_fn(pk)
                    i = zero
                for _ in range(cfg.STEPS_PER_EPOCH):
                    if resident:
                        self.state, i, metrics = train_step(
                            self.state, res_train, perm, i, base_key)
                    else:
                        key, sub = jax.random.split(key)
                        if mh:
                            batch = multihost.shard_batch_local(
                                self.mesh, next(train_gen),
                                cfg.BATCH_SIZE, bslice)
                        else:
                            batch = parallel.shard_batch(self.mesh,
                                                         next(train_gen))
                        self.state, metrics = train_step(self.state,
                                                         batch, sub)
                    n += 1
                    sums = metrics if sums is None else acc(sums, metrics)
                    if throttle:
                        jax.block_until_ready(metrics)
                    if log_every and n % log_every == 0 and p0:
                        # per-batch scalar logging (reference BatchLogger,
                        # net.py:1106-1115) — opting in syncs the host
                        with open(metrics_path, 'a') as f:
                            f.write(json.dumps(
                                {'step': int(self.state.step),
                                 **{k: round(float(v), 6)
                                    for k, v in metrics.items()}}) + '\n')
                sums = jax.device_get(sums) if sums else {}
                means = {k: float(v) / n for k, v in sums.items()}

                val_means = {}
                if val_gen is not None or res_val is not None:
                    vsums, vn = None, 0
                    iv = zero if resident else jnp.zeros((), jnp.int32)
                    vkey = jax.random.fold_in(base_key, (1 << 24) + epoch)
                    for _ in range(cfg.VALIDATION_STEPS):
                        if res_val is not None:
                            iv, m = eval_step(self.state, res_val, iv,
                                              vkey)
                        else:
                            key, sub = jax.random.split(key)
                            if mh:
                                batch = multihost.shard_batch_local(
                                    self.mesh, next(val_gen),
                                    cfg.BATCH_SIZE, bslice)
                            else:
                                batch = parallel.shard_batch(
                                    self.mesh, next(val_gen))
                            m = eval_step(self.state, batch, sub)
                        vn += 1
                        vsums = m if vsums is None else acc(vsums, m)
                        if throttle:
                            jax.block_until_ready(m)
                    vsums = jax.device_get(vsums) if vsums else {}
                    val_means = {f"val_{k}": float(v) / vn
                                 for k, v in vsums.items()}

                dt = time.time() - t0
                record = {'epoch': epoch, 'time_s': round(dt, 2),
                          'imgs_per_s': round(
                              n * cfg.BATCH_SIZE / dt, 2),
                          **{k: round(v, 6) for k, v in means.items()},
                          **{k: round(v, 6) for k, v in val_means.items()}}
                if p0:
                    with open(metrics_path, 'a') as f:
                        f.write(json.dumps(record) + '\n')
                    log_fn(f"epoch {epoch}: " + " ".join(
                        f"{k}={v}" for k, v in record.items()
                        if k != 'epoch'))

                self.save_weights(
                    ckpt.checkpoint_epoch(self.checkpoint_path, epoch))
                keep = int(getattr(cfg, 'CHECKPOINT_KEEP', 0) or 0)
                if keep > 0 and p0:
                    # Bound disk use on long runs: keep the newest `keep`
                    # per-epoch snapshots (state_latest always remains
                    # for exact resume). Reference keeps all (net.py:1120).
                    import glob as _glob
                    import re as _re
                    import shutil as _shutil
                    # Match ONLY per-epoch snapshots (all-digit epoch
                    # field) and order by parsed epoch: a bare '*' glob
                    # could delete unrelated weight files sharing the
                    # prefix, and lexicographic order breaks past epoch
                    # 9999 under %04d padding (ADVICE r2).
                    pat = _re.compile(_re.escape(
                        os.path.basename(self.checkpoint_path)
                    ).replace(_re.escape('*epoch*'), r'(\d+)') + r'\Z')
                    snaps = []
                    for p in _glob.glob(
                            self.checkpoint_path.replace('*epoch*', '*')):
                        m = pat.match(os.path.basename(p))
                        if m:
                            snaps.append((int(m.group(1)), p))
                    snaps = [p for _, p in sorted(snaps)]
                    for old in snaps[:-keep]:
                        try:
                            if os.path.isdir(old):
                                _shutil.rmtree(old)  # orbax snapshot dir
                            else:
                                os.remove(old)
                        except OSError:
                            pass
                if self._orbax:
                    from ursonet_tpu.checkpoint import orbax_store
                    orbax_store.save_state_dir(
                        os.path.join(self.log_dir, 'state_latest.orbax'),
                        self.state, epoch + 1)
                else:
                    ckpt.save_state(
                        os.path.join(self.log_dir, 'state_latest.msgpack'),
                        self.state, epoch + 1)
                self.epoch = epoch + 1
                last_means = {**means, **val_means}
        return last_means

    # -- introspection ---------------------------------------------------------

    def summary(self, log_fn=print) -> dict:
        """Per-top-module parameter counts + totals (the reference's layer
        printout / get_trainable_layers introspection, net.py:1298-1308)."""
        if self.state is None:
            self.initialize()
        import numpy as np
        counts = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                self.state.params):
            top = str(getattr(path[0], 'key', path[0]))
            counts[top] = counts.get(top, 0) + int(np.prod(np.shape(leaf)))
        total = sum(counts.values())
        for k in sorted(counts):
            log_fn(f"{k:20} {counts[k]:>14,}")
        log_fn(f"{'total':20} {total:>14,}")
        return {'per_module': counts, 'total': total}

    # -- inference -----------------------------------------------------------

    def quantize(self, calib_images: Optional[Sequence[np.ndarray]] = None,
                 headroom: float = 1.0):
        """Switch detect() to the calibrated int8 serving path
        (models/quant.py) — ~1.45x inference throughput on v5e.

        calib_images: optional raw images for activation-scale
        calibration; when omitted, calibration happens lazily on the
        first detect() batch. headroom scales the max-abs observations
        (<1 clips activation outliers — finer steps for the bulk at the
        cost of saturating the tail; >1 adds clipping margin).
        """
        from ursonet_tpu.models.quant import QuantizedModel
        if self.state is None:
            self.initialize()
        self._qmodel = QuantizedModel.from_variables(
            self.config, jax.device_get(self.state.params),
            jax.device_get(self.state.batch_stats))
        if self.mesh is not None and self.mesh.shape.get('data', 1) > 1:
            # data-parallel int8 serving over the engine's mesh (gate on
            # the DATA axis: a model-only mesh would just replicate the
            # whole batch on every device)
            self._qmodel.shard_over(self.mesh)
        if calib_images is not None:
            molded, _, _ = self.mold_inputs(calib_images)
            self._qmodel.calibrate(self._host_s2d_maybe(molded),
                                   percentile_headroom=headroom)
        return self._qmodel

    def _host_s2d_maybe(self, molded):
        """Host-side space-to-depth reindex of a [B,H,W,3] served batch
        (QUANT_HOST_S2D): same bytes, pure numpy reindex, so the device
        never pays the s2d transpose that made device-side s2d a net
        loss. Applies to every input the quant twin sees (serving AND
        calibration) — the twin's stem then consumes [B,H/2,W/2,12]
        directly (models/quant.py _stem)."""
        if not (self._qmodel is not None
                and self._qmodel._mcfg.get('host_s2d')
                and np.shape(molded)[-1] == 3):
            return molded
        b, h, w, c = np.shape(molded)
        x = np.asarray(molded).reshape(b, h // 2, 2, w // 2, 2, c)
        x = np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5))
        return x.reshape(b, h // 2, w // 2, 4 * c)

    def predict_molded(self, molded):
        """Forward a molded [B,H,W,3] batch through the serving path —
        the int8 quantized model after quantize(), the float jit
        otherwise — with the batch sharded over the mesh 'data' axis.
        Single entry point for detect()/evaluate/video."""
        if self.state is None:
            self.initialize()
        if (self._qmodel is not None
                and getattr(self.config, 'INT8_U8_INPUT', True)
                and np.shape(molded)[-1] == 3
                and np.asarray(molded).dtype != np.uint8):
            # int8 serving: ship raw uint8 pixels (1 byte/px instead of a
            # 4-byte molded float — the host->device link is the serving
            # bottleneck on remote-tunnel platforms) and let the quant
            # twin fold the mean-subtract into its input quantize
            # (models/quant.py F32Ops._mold_maybe).
            mean = np.asarray(self.config.MEAN_PIXEL, np.float32)
            molded = np.clip(np.rint(np.asarray(molded, np.float32) + mean),
                             0, 255).astype(np.uint8)
        molded = self._host_s2d_maybe(molded)
        n = int(np.shape(molded)[0])
        pad = 0
        if self.mesh.size > 1:
            # device_put with a 'data'-axis sharding requires the batch
            # to divide evenly over the mesh rows; pad by repeating the
            # last row and trim the outputs after.
            rows = self.mesh.shape[parallel.AXIS_DATA]
            molded = np.asarray(molded)
            pad = (-n) % rows
            if pad:
                molded = np.concatenate(
                    [molded, np.repeat(molded[-1:], pad, axis=0)], axis=0)
            molded = jax.device_put(molded,
                                    parallel.batch_sharding(self.mesh))
        else:
            molded = jnp.asarray(molded)
        if self._qmodel is not None:
            if self._qmodel.act_scales is None:  # lazy calibration
                print("int8: calibrating activation scales lazily on the "
                      f"first served batch (shape {molded.shape}); for "
                      "deterministic scales calibrate eagerly via "
                      "quantize(calib_images) or load a serving artifact")
                self._qmodel.calibrate(molded)
            out = self._qmodel(molded)
        else:
            out = self._predict(self.state.params, self.state.batch_stats,
                                molded)
        if pad:
            out = {k: v[:n] for k, v in out.items()}
        return out

    def mold_inputs(self, images: Sequence[np.ndarray]):
        """Resize + mean-subtract + meta for a list of raw images
        (reference net.py:1169-1205)."""
        cfg = self.config
        molded, metas, windows = [], [], []
        for image in images:
            m, window, scale, padding, crop = imops.resize_image(
                image, min_dim=cfg.IMAGE_MIN_DIM,
                min_scale=cfg.IMAGE_MIN_SCALE,
                max_dim=cfg.IMAGE_MAX_DIM, mode=cfg.IMAGE_RESIZE_MODE)
            molded.append(imops.mold_image(m.astype(np.float32), cfg))
            metas.append(imops.compose_image_meta(
                0, image.shape, m.shape, window, scale))
            windows.append(window)
        return (np.stack(molded), np.stack(metas), np.stack(windows))

    def detect(self, images: Sequence[np.ndarray],
               verbose: bool = False) -> List[dict]:
        """Run inference on a list of raw images; returns per-image dicts
        of raw head outputs (reference net.py:1207-1259)."""
        cfg = self.config
        assert len(images) == cfg.BATCH_SIZE, \
            "len(images) must equal BATCH_SIZE"
        if self.state is None:
            self.initialize()
        molded, metas, _ = self.mold_inputs(images)
        shapes = {m.shape for m in molded}
        assert len(shapes) == 1, "images must mold to a single shape"
        outputs = self.predict_molded(molded)
        outputs = {k: np.asarray(v) for k, v in outputs.items()}
        results = []
        for i in range(len(images)):
            if cfg.REGRESS_KEYPOINTS:
                results.append({'loc': outputs['loc'][i],
                                'k1': outputs['k1'][i],
                                'k2': outputs['k2'][i]})
            else:
                results.append({'loc': outputs['loc'][i],
                                'ori': outputs['ori'][i]})
        return results
