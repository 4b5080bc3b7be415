"""Evaluation: full-dataset metrics, decode, CSV artifacts.

Re-designs the reference `evaluate` (pose_estimator.py:321-459) as a
batched device pipeline: images are molded and run through the jitted
forward in batches, decoded in one batched XLA call (softmax moments /
weighted quaternion average — ops/decode.py), and the error metrics are
computed vectorized. Artifact parity: prints the same means and writes
`ori_err.csv`, `loc_err.csv`, `dists_err.csv` (pose_estimator.py:451-459).

Also: `evaluate_image` single-image variant (pose_estimator.py:156-215)
and `decode_results` shared by test/submit paths
(pose_estimator.py:239-315, 487-527).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ursonet_tpu import se3
from ursonet_tpu.ops import decode as D


def _batched_forward(engine, dataset, image_ids):
    """Mold + forward the given ids in BATCH_SIZE chunks; returns stacked
    raw head outputs (order matches image_ids; the tail batch is padded
    and trimmed — static shapes for XLA).

    Host decode+mold runs in a prefetch thread overlapped with the
    device forward, and the per-chunk device->host fetch is deferred one
    chunk (chunk k+1 dispatches before chunk k's outputs are pulled), so
    neither side ever waits on the other at steady state."""
    from ursonet_tpu.data.loader import Prefetcher
    if not len(image_ids):
        raise ValueError("no images to evaluate (empty dataset subset)")
    cfg = engine.config
    bs = cfg.BATCH_SIZE

    def molded_chunks():
        for i in range(0, len(image_ids), bs):
            chunk = list(image_ids[i:i + bs])
            chunk_ids = chunk + [chunk[-1]] * (bs - len(chunk))
            images = [dataset.load_image(j) for j in chunk_ids]
            molded, _, _ = engine.mold_inputs(images)
            yield len(chunk), molded

    outs = []
    pending = None  # (n, device outputs) — fetched one chunk late
    for n, molded in Prefetcher(molded_chunks(), depth=2):
        raw = engine.predict_molded(molded)
        if pending is not None:
            pn, praw = pending
            outs.append({k: np.asarray(v)[:pn] for k, v in praw.items()})
        pending = (n, raw)
    pn, praw = pending
    outs.append({k: np.asarray(v)[:pn] for k, v in praw.items()})
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def decode_results(outputs, config, dataset):
    """Batched decode of raw head outputs -> (loc_est [N,3], q_est [N,4]).

    Mirrors the decode logic repeated across the reference driver
    (pose_estimator.py:376-409): regression passthroughs / conversions,
    classification softmax moments, keypoint SVD alignment.
    """
    if config.REGRESS_KEYPOINTS:
        locs = np.asarray(outputs['loc'], np.float64)
        k1 = np.asarray(outputs['k1'], np.float64)
        k2 = np.asarray(outputs['k2'], np.float64)
        kp_scale = 3.0 if dataset is None or dataset.name == 'Urso' else 1.0
        qs = np.zeros((len(locs), 4))
        for i in range(len(locs)):
            P1 = np.zeros((3, 3))
            P1[2, 0] = kp_scale
            P1[1, 1] = kp_scale
            P2 = np.stack([k1[i], k2[i], locs[i]], axis=1)
            t, R = se3.pose_3Dto3D(P1, P2)
            qs[i] = se3.SO32quat(np.asarray(R).T)
        return locs, qs

    if config.REGRESS_LOC:
        loc_est = np.asarray(outputs['loc'], np.float64)
    else:
        loc_est = np.asarray(D.decode_loc_pmf(
            outputs['loc'], dataset.histogram_3D_map), np.float64)

    if config.REGRESS_ORI:
        q_est = np.asarray(D.decode_ori_regression(
            jnp.asarray(outputs['ori']), config.ORIENTATION_PARAM),
            np.float64)
    else:
        q_est = np.asarray(D.decode_ori_pmf(
            outputs['ori'], dataset.ori_histogram_map), np.float64)
    return loc_est, q_est


def encoding_errors(config, dataset, image_ids):
    """Quantization-floor metrics: decode the *GT* encodings and compare to
    the raw GT (reference pose_estimator.py:386-388, 428-431)."""
    loc_errs, ori_errs = [], []
    for i in image_ids:
        loc_gt = np.asarray(dataset.load_location(i), np.float64)
        q_gt = np.asarray(dataset.load_quaternion(i), np.float64)
        if not config.REGRESS_LOC:
            enc = dataset.load_location_encoded(i)
            dec = np.asarray(enc, np.float64) @ np.asarray(
                dataset.histogram_3D_map, np.float64)
            loc_errs.append(float(np.linalg.norm(dec - loc_gt)))
        if not config.REGRESS_ORI:
            enc = dataset.load_orientation_encoded(i)
            q_dec = np.asarray(D.decode_ori_encoded(
                jnp.asarray(enc)[None], dataset.ori_histogram_map))[0]
            d = abs(float(np.dot(q_dec, q_gt)))
            ori_errs.append(2 * np.arccos(min(d, 1.0)) * 180 / np.pi)
    return loc_errs, ori_errs


def multimodal_orientations(outputs, config, dataset, nr_em_iterations=5):
    """Per-image quaternion GMM fits on the orientation PMFs — the
    reference's experimental EM framework (pose_estimator.py:42-154,
    invocation sketch at 411-426) made reachable. Classification mode
    only. Returns a list of (means [N,4], variances [N], priors [N])."""
    from ursonet_tpu.ops.gmm import fit_gmm_to_orientation
    assert not config.REGRESS_ORI, \
        "--multimodal requires orientation soft-classification"
    delta = config.BETA / config.ORI_BINS_PER_DIM
    var = delta ** 2 / 12  # reference pose_estimator.py:333-334
    pmfs = np.asarray(D.stable_softmax(jnp.asarray(outputs['ori'])))
    fits = []
    for pmf in pmfs:
        means, variances, priors, _ = fit_gmm_to_orientation(
            dataset.ori_histogram_map, pmf, nr_em_iterations, var)
        fits.append((means, variances, priors))
    return fits


def evaluate(engine, dataset, out_dir: str = '.',
             log_fn=print, multimodal: bool = False) -> dict:
    """Full-dataset evaluation (reference pose_estimator.py:321-459).

    Returns the summary metric dict; writes per-image CSVs to out_dir.
    multimodal=True additionally fits a quaternion GMM per image and
    reports the best-of-top-2-modes oracle error (the selection the
    reference's commented block computes, pose_estimator.py:417-423).
    """
    cfg = engine.config
    ids = list(dataset.image_ids)
    outputs = _batched_forward(engine, dataset, ids)
    loc_est, q_est = decode_results(outputs, cfg, dataset)

    loc_gt = np.stack([dataset.load_location(i) for i in ids]).astype(
        np.float64)
    q_gt = np.stack([dataset.load_quaternion(i) for i in ids]).astype(
        np.float64)

    ori_err = np.asarray(D.angular_error_deg(jnp.asarray(q_est),
                                             jnp.asarray(q_gt)))
    loc_err = np.asarray(D.location_error(jnp.asarray(loc_est),
                                          jnp.asarray(loc_gt)))
    esa = np.asarray(D.esa_score(jnp.asarray(loc_est), jnp.asarray(loc_gt),
                                 jnp.asarray(q_est), jnp.asarray(q_gt)))
    dists = loc_gt[:, 2]

    loc_enc_errs, ori_enc_errs = encoding_errors(cfg, dataset, ids)

    summary = {
        'mean_loc_err': float(np.mean(loc_err)),
        'mean_ori_err_deg': float(np.mean(ori_err)),
        'esa_score': float(np.mean(esa)),
    }
    log_fn(f"Mean est. location error:  {summary['mean_loc_err']}")
    log_fn(f"Mean est. orientation error:  {summary['mean_ori_err_deg']}")
    log_fn(f"ESA score:  {summary['esa_score']}")
    if loc_enc_errs:
        summary['mean_loc_encoded_err'] = float(np.mean(loc_enc_errs))
        log_fn("Mean encoded location error:  "
               f"{summary['mean_loc_encoded_err']}")
    if ori_enc_errs:
        summary['mean_ori_encoded_err_deg'] = float(np.mean(ori_enc_errs))
        log_fn("Mean encoded orientation error:  "
               f"{summary['mean_ori_encoded_err_deg']}")

    if multimodal:
        fits = multimodal_orientations(outputs, cfg, dataset)
        oracle = []
        for (means, variances, priors), gt in zip(fits, q_gt):
            errs = 2 * np.arccos(np.clip(np.abs(means[:2] @ gt), 0, 1)) \
                * 180 / np.pi
            oracle.append(float(np.min(errs)))
        summary['multimodal_oracle_ori_err_deg'] = float(np.mean(oracle))
        log_fn("Multimodal best-of-2-modes orientation error:  "
               f"{summary['multimodal_oracle_ori_err_deg']}")

    os.makedirs(out_dir, exist_ok=True)
    pd.DataFrame(ori_err).to_csv(os.path.join(out_dir, "ori_err.csv"))
    pd.DataFrame(loc_err).to_csv(os.path.join(out_dir, "loc_err.csv"))
    pd.DataFrame(dists).to_csv(os.path.join(out_dir, "dists_err.csv"))
    return summary


def evaluate_image(engine, dataset, image_id: int,
                   log_fn=print) -> dict:
    """Single-image evaluation (reference evaluate_image,
    pose_estimator.py:156-215)."""
    cfg = engine.config
    image = dataset.load_image(image_id)
    images = [image] * cfg.BATCH_SIZE
    molded, metas, _ = engine.mold_inputs(images)
    raw = engine.predict_molded(molded)
    raw = {k: np.asarray(v)[:1] for k, v in raw.items()}
    loc_est, q_est = decode_results(raw, cfg, dataset)
    loc_gt = np.asarray(dataset.load_location(image_id), np.float64)
    q_gt = np.asarray(dataset.load_quaternion(image_id), np.float64)
    d = abs(float(np.dot(q_est[0], q_gt)))
    out = {
        'loc_est': loc_est[0], 'q_est': q_est[0],
        'loc_err': float(np.linalg.norm(loc_est[0] - loc_gt)),
        'ori_err_deg': 2 * np.arccos(min(d, 1.0)) * 180 / np.pi,
    }
    log_fn(f"Loc Error: {out['loc_err']}  Ori Error: {out['ori_err_deg']}")
    return out


def detect_dataset(engine, dataset, n_images: int = 10,
                   seed: Optional[int] = 7, out_dir: Optional[str] = None,
                   log_fn=print, multimodal: bool = False):
    """Spot-check N random images: decode + per-image error printout
    (reference detect_dataset, pose_estimator.py:462-604). With out_dir
    set, saves visualization overlays instead of opening windows.
    multimodal=True also prints each image's GMM modes (quaternion,
    prior, variance)."""
    rng = np.random.RandomState(seed)
    ids = rng.choice(dataset.image_ids,
                     min(n_images, len(dataset.image_ids)), replace=False)
    outputs = _batched_forward(engine, dataset, list(ids))
    loc_est, q_est = decode_results(outputs, engine.config, dataset)
    fits = multimodal_orientations(outputs, engine.config, dataset) \
        if multimodal else None
    results = []
    for n, i in enumerate(ids):
        loc_gt = np.asarray(dataset.load_location(i), np.float64)
        q_gt = np.asarray(dataset.load_quaternion(i), np.float64)
        d = abs(float(np.dot(q_est[n], q_gt)))
        r = {'image_id': int(i), 'loc_est': loc_est[n], 'q_est': q_est[n],
             'loc_err': float(np.linalg.norm(loc_est[n] - loc_gt)),
             'ori_err_deg': 2 * np.arccos(min(d, 1.0)) * 180 / np.pi}
        log_fn(f"Image {i}: loc_err={r['loc_err']:.3f} "
               f"ori_err={r['ori_err_deg']:.2f} deg")
        if fits is not None:
            means, variances, priors = fits[n]
            r['modes'] = [
                {'q': means[m].tolist(), 'prior': float(priors[m]),
                 'var': float(variances[m])}
                for m in range(len(means))]
            for m, mode in enumerate(r['modes']):
                log_fn(f"  mode {m}: prior={mode['prior']:.3f} "
                       f"var={mode['var']:.5f} "
                       f"q={np.round(mode['q'], 4).tolist()}")
        results.append(r)
        if out_dir:
            from ursonet_tpu.ops import viz
            os.makedirs(out_dir, exist_ok=True)
            viz.save_axes_overlay(
                dataset.load_image(i), dataset.camera.K,
                loc_gt, q_gt, loc_est[n], q_est[n],
                os.path.join(out_dir, f"overlay_{i}.png"))
    return results
