"""Input pipeline: host loading/batching + on-device preprocessing.

Two modes, selected by config.AUGMENT_ON_DEVICE:

Host-parity mode — reproduces the reference data path exactly
(net.py:358-559): per-image load → sim2real → rotation augmentation at
original resolution (cv2) → resize/pad → mean-subtract → batch.

Device mode (default, TPU-first) — the host only decodes, resizes to the
static network shape and batches uint8; augmentation (sim2real noise
pipeline + rotation homography warp + pose update + orientation PMF
re-encode) and the mold run batched on device inside the jitted train
step. This removes the reference's need for a multiprocessing worker pool
(net.py:1147-1163): the host loop is a cheap decode+resize and a
background prefetch thread keeps the device fed.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ursonet_tpu.data.urso import encode_as_keypoints
from ursonet_tpu.ops import augment as aug
from ursonet_tpu.ops import encoders
from ursonet_tpu.ops import image as imops


def load_image_gt(dataset, config, image_id, rng=None):
    """Host-parity per-sample load + augment (reference net.py:358-456).

    Returns (image, image_meta, loc, ori) or
    (image, image_meta, loc, k1, k2) in keypoint mode.
    """
    rng = rng or np.random
    image = dataset.load_image(image_id)

    if config.REGRESS_LOC:
        loc = np.asarray(dataset.load_location(image_id), np.float64)
    else:
        loc = dataset.load_location_encoded(image_id)

    k1 = k2 = None
    if config.REGRESS_KEYPOINTS:
        keypoints = dataset.load_keypoints(image_id)
        k1, k2 = keypoints[0], keypoints[1]

    if config.REGRESS_KEYPOINTS or config.REGRESS_ORI:
        if config.ORIENTATION_PARAM == 'quaternion':
            ori = np.asarray(dataset.load_quaternion(image_id), np.float64)
        elif config.ORIENTATION_PARAM == 'euler_angles':
            ori = np.asarray(dataset.load_euler_angles(image_id), np.float64)
        elif config.ORIENTATION_PARAM == 'angle_axis':
            ori = np.asarray(dataset.load_angle_axis(image_id), np.float64)
    else:
        ori = dataset.load_orientation_encoded(image_id)

    if config.SIM2REAL_AUG:
        image = aug.sim2real_host(image, rng)

    if config.ROT_AUG or config.ROT_IMAGE_AUG:
        assert config.REGRESS_LOC
        assert config.ORIENTATION_PARAM == 'quaternion'
        dice = rng.rand(1)[0]
        if config.ROT_AUG and dice > 0.5:
            if config.REGRESS_KEYPOINTS or config.REGRESS_ORI:
                image, loc, ori = aug.rotate_cam(
                    image, loc, ori, dataset.camera.K, 20, rng)
                k1, k2 = encode_as_keypoints(ori, loc)
                k1, k2 = k1[0], k2[0]
            else:
                q = dataset.load_quaternion(image_id)
                image, loc, q = aug.rotate_cam(
                    image, loc, q, dataset.camera.K, 20, rng)
                ori = encoders.encode_ori_fast(
                    q, config.BETA, dataset.ori_histogram_map,
                    dataset.ori_output_mask)
        elif config.ROT_IMAGE_AUG and dice <= 0.5:
            if config.REGRESS_KEYPOINTS or config.REGRESS_ORI:
                image, loc, ori = aug.rotate_image(
                    image, loc, ori, dataset.camera.K, rng)
                k1, k2 = encode_as_keypoints(ori, loc)
                k1, k2 = k1[0], k2[0]
            else:
                q = dataset.load_quaternion(image_id)
                image, loc, q = aug.rotate_image(
                    image, loc, q, dataset.camera.K, rng)
                ori = encoders.encode_ori_fast(
                    q, config.BETA, dataset.ori_histogram_map,
                    dataset.ori_output_mask)

    original_shape = image.shape
    image, window, scale, padding, crop = imops.resize_image(
        image,
        min_dim=config.IMAGE_MIN_DIM,
        min_scale=config.IMAGE_MIN_SCALE,
        max_dim=config.IMAGE_MAX_DIM,
        mode=config.IMAGE_RESIZE_MODE)
    image_meta = imops.compose_image_meta(
        image_id, original_shape, image.shape, window, scale)

    if config.REGRESS_KEYPOINTS:
        return image, image_meta, loc, np.asarray(k1).reshape(3), \
            np.asarray(k2).reshape(3)
    return image, image_meta, loc, ori


def data_generator(dataset, config, shuffle=True, batch_size=1,
                   seed: Optional[int] = None,
                   raw: Optional[bool] = None,
                   batch_slice: Optional[tuple] = None) -> Iterator[dict]:
    """Infinite batch generator (reference net.py:458-559).

    raw=None: follow config.AUGMENT_ON_DEVICE. raw=True yields uint8
    resized images + raw poses for on-device augmentation; raw=False
    yields fully augmented + molded float batches (host-parity).
    Error-tolerant: skips bad images, raises after 5 failures
    (net.py:551-559).

    batch_slice: multi-host per-process input sharding — the id sequence
    is still the full deterministic global stream (identical on every
    host given the same seed), but only this process's rows of each
    global batch are decoded and yielded. Accepts (lo, hi) for the
    standard contiguous mapping or an index array for interleaved
    topologies (parallel/multihost.local_batch_slice). With a
    batch_slice set, ANY per-image error raises immediately: the
    single-host 5-strike skip would silently desync the global shuffle
    stream across hosts and corrupt every subsequent batch composition.
    """
    if raw is None:
        raw = bool(getattr(config, 'AUGMENT_ON_DEVICE', False))
    multi_host = batch_slice is not None
    from ursonet_tpu.parallel.multihost import slice_rows
    sel_rows = slice_rows(batch_slice, batch_size)
    # local position of each selected global row; -1 = not ours
    row_pos = np.full(batch_size, -1, np.int64)
    row_pos[sel_rows] = np.arange(len(sel_rows))
    # Two RNG streams: the id-shuffle stream must advance identically on
    # every host (it defines the global batch composition), while the
    # per-sample augmentation stream is host-local (parity mode consumes
    # it per LOADED sample, which differs per slice).
    rng = np.random.RandomState(seed)
    aug_rng = np.random.RandomState(
        None if seed is None else seed + 104729 + int(sel_rows[0]))
    image_ids = np.copy(dataset.image_ids)
    dtype = np.float16 if config.F16 else np.float32
    b = 0
    image_index = -1
    error_count = 0
    batch = {}

    # Native fast path: one threaded C++ call decodes + resizes + places
    # the whole batch (data/native_loader.py). Only for the raw/on-device
    # pipeline with deterministic geometry (none/square/pad64).
    native_geom = None
    if raw and getattr(config, 'NATIVE_LOADER', True) \
            and config.IMAGE_RESIZE_MODE in ('none', 'square', 'pad64'):
        from ursonet_tpu.data import native_loader
        if native_loader.available():
            probe = np.zeros((dataset.camera.height, dataset.camera.width,
                              3), np.uint8)
            resized, window, scale, _, _ = imops.resize_image(
                probe, min_dim=config.IMAGE_MIN_DIM,
                min_scale=config.IMAGE_MIN_SCALE,
                max_dim=config.IMAGE_MAX_DIM,
                mode=config.IMAGE_RESIZE_MODE)
            native_geom = {
                'out_h': resized.shape[0], 'out_w': resized.shape[1],
                'content_h': int(window[2] - window[0]),
                'content_w': int(window[3] - window[1]),
                'top': int(window[0]), 'left': int(window[1]),
                'meta_window': window, 'scale': scale,
            }

    if native_geom is not None:
        g = native_geom
        orig_shape = (dataset.camera.height, dataset.camera.width, 3)
        while True:
            try:
                ids = []
                while len(ids) < batch_size:
                    image_index = (image_index + 1) % len(image_ids)
                    if shuffle and image_index == 0:
                        rng.shuffle(image_ids)
                    ids.append(int(image_ids[image_index]))
                # this process's rows of the global batch
                sel = [ids[j] for j in sel_rows]
                paths = [dataset.image_info[i]['path'] for i in sel]
                images = native_loader.load_batch(
                    paths, g['out_h'], g['out_w'], g['content_h'],
                    g['content_w'], g['top'], g['left'])
                batch = {'images_u8': images}
                samples = [_raw_pose_fields(dataset, config, i)
                           for i in sel]
                for k in samples[0]:
                    batch[k] = np.stack([s[k] for s in samples])
                batch['image_meta'] = np.stack([
                    imops.compose_image_meta(
                        i, orig_shape,
                        (g['out_h'], g['out_w'], 3),
                        g['meta_window'], g['scale'])
                    for i in sel])
                yield batch
            except (GeneratorExit, KeyboardInterrupt):
                raise
            except Exception:
                import logging
                logging.exception("Error in native batch load")
                if multi_host:
                    raise  # skipping would desync the global stream
                error_count += 1
                if error_count > 5:
                    raise

    while True:
        try:
            image_index = (image_index + 1) % len(image_ids)
            if shuffle and image_index == 0:
                rng.shuffle(image_ids)
            image_id = int(image_ids[image_index])

            pos = row_pos[b]
            if pos >= 0:  # rows outside this host's slice are skipped
                if raw:
                    sample = _load_raw(dataset, config, image_id)
                else:
                    sample = _load_parity(dataset, config, image_id,
                                          aug_rng, dtype)
                if not batch:
                    batch = {k: np.zeros((len(sel_rows),) + np.shape(v),
                                         dtype=np.asarray(v).dtype)
                             for k, v in sample.items()}
                for k, v in sample.items():
                    batch[k][pos] = v
            b += 1
            if b >= batch_size:
                yield batch
                b = 0
                batch = {}
        except (GeneratorExit, KeyboardInterrupt):
            raise
        except Exception:
            import logging
            logging.exception("Error processing image %s",
                              dataset.image_info[image_id])
            if multi_host:
                raise  # skipping would desync the global stream
            error_count += 1
            if error_count > 5:
                raise


def _load_parity(dataset, config, image_id, rng, dtype):
    out = load_image_gt(dataset, config, image_id, rng)
    if config.REGRESS_KEYPOINTS:
        image, meta, loc, k1, k2 = out
        return {
            'images': imops.mold_image(image.astype(dtype), config),
            'image_meta': meta,
            'gt_loc': np.asarray(loc, dtype),
            'gt_k1': np.asarray(k1, dtype),
            'gt_k2': np.asarray(k2, dtype),
        }
    image, meta, loc, ori = out
    return {
        'images': imops.mold_image(image.astype(dtype), config),
        'image_meta': meta,
        'gt_loc': np.asarray(loc, dtype),
        'gt_ori': np.asarray(ori, dtype),
    }


def _raw_pose_fields(dataset, config, image_id):
    """Pose/GT fields of a raw sample (everything but the image)."""
    sample = {
        'location': np.asarray(dataset.load_location(image_id), np.float32),
        'quaternion': np.asarray(dataset.load_quaternion(image_id),
                                 np.float32),
    }
    if not config.REGRESS_LOC:
        sample['loc_map'] = np.asarray(
            dataset.load_location_encoded(image_id), np.float32)
    if config.REGRESS_ORI and config.ORIENTATION_PARAM == 'euler_angles':
        sample['pyr'] = np.asarray(dataset.load_euler_angles(image_id),
                                   np.float32)
    if config.REGRESS_ORI and config.ORIENTATION_PARAM == 'angle_axis':
        sample['angleaxis'] = np.asarray(dataset.load_angle_axis(image_id),
                                         np.float32)
    if config.REGRESS_KEYPOINTS:
        kps = dataset.load_keypoints(image_id)
        sample['gt_k1'] = np.asarray(kps[0], np.float32).reshape(3)
        sample['gt_k2'] = np.asarray(kps[1], np.float32).reshape(3)
    return sample


def _load_raw(dataset, config, image_id):
    """Device-mode host work: decode + resize only; poses raw."""
    image = dataset.load_image(image_id)
    original_shape = image.shape
    image, window, scale, padding, crop = imops.resize_image(
        image,
        min_dim=config.IMAGE_MIN_DIM,
        min_scale=config.IMAGE_MIN_SCALE,
        max_dim=config.IMAGE_MAX_DIM,
        mode=config.IMAGE_RESIZE_MODE)
    meta = imops.compose_image_meta(image_id, original_shape, image.shape,
                                    window, scale)
    sample = {'images_u8': image.astype(np.uint8), 'image_meta': meta}
    sample.update(_raw_pose_fields(dataset, config, image_id))
    return sample


def resident_bytes(dataset, config) -> int:
    """Estimated device bytes of the resident raw arrays for `dataset`."""
    probe = _load_raw(dataset, config, int(dataset.image_ids[0]))
    per = sum(np.asarray(v).nbytes for v in probe.values())
    return per * len(dataset.image_ids)


def use_resident(dataset, config) -> bool:
    """Whether to keep this dataset device-resident for training.

    Requires the on-device augmentation path (host-parity augmentation is
    per-sample host RNG and cannot be device-resident) and the dataset
    fitting under DATA_ON_DEVICE_MAX_MB. DATA_ON_DEVICE: True forces
    (subject to the raw-mode requirement), False disables, 'auto' sizes.
    """
    knob = getattr(config, 'DATA_ON_DEVICE', 'auto')
    raw = bool(getattr(config, 'AUGMENT_ON_DEVICE', False))
    if knob is False or not raw:
        return False
    if jax.process_count() > 1:
        # multi-host runs stream per-process input shards instead
        # (parallel/multihost.py)
        return False
    if knob is True:
        return True
    cap = int(getattr(config, 'DATA_ON_DEVICE_MAX_MB', 1024)) * (1 << 20)
    return resident_bytes(dataset, config) <= cap


def load_dataset_resident(dataset, config, mesh=None):
    """One-time upload of the whole dataset as stacked raw device arrays
    (replicated over the mesh), for index-gather batching inside the
    jitted train step (train/step.make_resident_train_step).

    Motivation (beyond throughput): on remote-tunnel platforms every
    host->device transfer pins its host buffer (see PERF.md, axon leak
    note), so per-step batch shipping bounds run length; the resident
    path performs ONE bulk transfer and zero per-step transfers.

    Returns (data_dict, n_images).
    """
    ids = [int(i) for i in dataset.image_ids]
    samples = [_load_raw(dataset, config, i) for i in ids]
    data = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    if mesh is not None:
        from ursonet_tpu import parallel
        sh = parallel.replicated(mesh)
        data = {k: jax.device_put(v, sh) for k, v in data.items()}
    else:
        data = {k: jnp.asarray(v) for k, v in data.items()}
    return data, len(ids)


def make_device_preprocess(config, dataset):
    """Build the jitted on-device preprocessing: raw batch dict -> model
    batch dict {'images', 'gt_loc', 'gt_ori' | 'gt_k1','gt_k2'}.

    Fuses sim2real, rotation augmentation (+ pose update + PMF re-encode)
    and the mean-subtract mold into one XLA program. The rotation warp uses
    intrinsics rescaled to the network resolution (see
    ops/augment.scaled_intrinsics).
    """
    mean_pixel = jnp.asarray(config.MEAN_PIXEL, jnp.float32)
    rot = config.ROT_AUG or config.ROT_IMAGE_AUG
    if rot:
        assert config.REGRESS_LOC
        assert config.ORIENTATION_PARAM == 'quaternion'

    # Static per-config resize geometry: probe one sample.
    probe_h = dataset.camera.height
    probe_w = dataset.camera.width
    probe = np.zeros((probe_h, probe_w, 3), np.uint8)
    _, window, scale, _, _ = imops.resize_image(
        probe, min_dim=config.IMAGE_MIN_DIM, min_scale=config.IMAGE_MIN_SCALE,
        max_dim=config.IMAGE_MAX_DIM, mode=config.IMAGE_RESIZE_MODE)
    K_net = aug.scaled_intrinsics(dataset.camera.K, (probe_h, probe_w),
                                  window, scale)
    K_net = jnp.asarray(K_net, jnp.float32)

    ori_grid_quat = ori_grid_mask = None
    if not config.REGRESS_ORI and dataset.ori_histogram_map is not None:
        ori_grid_quat = jnp.asarray(dataset.ori_histogram_map)
        ori_grid_mask = jnp.asarray(dataset.ori_output_mask)

    kp_scale = 3.0 if dataset.name == 'Urso' else 1.0
    interp = getattr(config, 'WARP_INTERPOLATION', 'nearest')

    def preprocess(key, raw):
        images = raw['images_u8'].astype(jnp.float32)
        locs = raw['location']
        quats = raw['quaternion']

        if config.SIM2REAL_AUG:
            key, sub = jax.random.split(key)
            images = aug.sim2real_batch(
                sub, images,
                per_image_order=bool(getattr(
                    config, 'SIM2REAL_PER_IMAGE_ORDER', False)))

        if rot:
            key, sub = jax.random.split(key)
            images, locs, quats = aug.rotation_augment_batch(
                sub, images, locs, quats, K_net, 20.0,
                config.ROT_AUG, config.ROT_IMAGE_AUG, interp,
                grayscale=bool(config.SIM2REAL_AUG),
                use_pallas=bool(getattr(config, 'PALLAS_WARP', True)))

        batch = {'images': images - mean_pixel,
                 'image_meta': raw['image_meta']}

        if config.REGRESS_KEYPOINTS:
            batch['gt_loc'] = locs
            if rot:
                from ursonet_tpu import se3jax
                R = se3jax.quat2SO3(quats)
                e3 = jnp.asarray([0.0, 0.0, 1.0]) * kp_scale
                e2 = jnp.asarray([0.0, 1.0, 0.0]) * kp_scale
                batch['gt_k1'] = jnp.einsum('bij,j->bi', R, e3) + locs
                batch['gt_k2'] = jnp.einsum('bij,j->bi', R, e2) + locs
            else:
                batch['gt_k1'] = raw['gt_k1']
                batch['gt_k2'] = raw['gt_k2']
            return batch

        batch['gt_loc'] = locs if config.REGRESS_LOC else raw['loc_map']

        if config.REGRESS_ORI:
            if config.ORIENTATION_PARAM == 'quaternion':
                batch['gt_ori'] = quats
            elif config.ORIENTATION_PARAM == 'euler_angles':
                batch['gt_ori'] = raw['pyr']
            else:
                batch['gt_ori'] = raw['angleaxis']
        else:
            # On-device PMF (re-)encode — replaces encode_ori_fast
            # (net.py:427,438); identical formula whether rotated or not.
            batch['gt_ori'] = encoders.encode_ori_pmf(
                quats, ori_grid_quat, ori_grid_mask, config.BETA,
                config.ORI_BINS_PER_DIM, xp=jnp)
        return batch

    return preprocess


_DONE = object()  # Prefetcher end-of-stream sentinel


class Prefetcher:
    """Background-thread prefetch wrapping a generator (replaces the
    reference's multiprocessing worker pool, net.py:1147-1163). Handles
    both infinite generators (training) and finite ones (evaluation
    chunk streams)."""

    def __init__(self, it: Iterator, depth: int = 8):
        self._it = it
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._exhausted = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(item)
        except Exception as e:  # propagate to consumer
            self._err = e
        self._q.put(_DONE)

    def __iter__(self):
        return self

    def __next__(self):
        if self._exhausted:      # iterator protocol: keep raising
            if self._err is not None:  # a producer error stays an error
                raise self._err        # on re-entry, never StopIteration
            raise StopIteration  # instead of blocking on a dead queue
        item = self._q.get()
        if item is _DONE:
            self._exhausted = True
            raise self._err if self._err else StopIteration
        return item
