"""Video inference (reference detect_video, pose_estimator.py:606-745).

Reads a video, runs the jitted forward per frame (frames are batched up to
BATCH_SIZE for TPU efficiency — the reference ran one frame at a time),
decodes poses, overlays the estimated body axes, and writes an annotated
video next to the input. The UnrealCV re-rendering block of the reference
(commented out there, pose_estimator.py:705-745) is not reproduced.
"""

from __future__ import annotations

import os

import numpy as np

from ursonet_tpu import se3
from ursonet_tpu.evaluate import decode_results
from ursonet_tpu.ops.viz import axes_endpoints, project_points


def _overlay_axes(frame, K, loc, q, frame_convention='unreal',
                  scale: float = 1.0):
    import cv2
    origin, ends = axes_endpoints(q, loc, scale)
    o2 = project_points(K, origin[None], frame_convention)[0]
    e2 = project_points(K, ends, frame_convention)
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    out = np.ascontiguousarray(frame)

    def pt(v):
        # estimates can project far outside the frame (or behind the
        # camera) — clamp to a sane integer range for cv2
        v = np.nan_to_num(np.asarray(v, np.float64), nan=0.0,
                          posinf=1e6, neginf=-1e6)
        return tuple(int(x) for x in np.clip(v, -32768, 32767))

    for i, c in enumerate(colors):
        cv2.line(out, pt(o2), pt(e2[i]), c, 2)
    return out


class _Cv2Reader:
    """cv2-backed frame iterator + writer pair (imageio's video plugins
    need ffmpeg, which isn't guaranteed; cv2 ships its own codecs)."""

    def __init__(self, path):
        import cv2
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise IOError(f"cannot open video {path}")
        self.fps = self._cap.get(cv2.CAP_PROP_FPS) or 25

    def __iter__(self):
        import cv2
        while True:
            ok, frame = self._cap.read()
            if not ok:
                return
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def close(self):
        self._cap.release()


class _Cv2Writer:
    def __init__(self, path, fps):
        self._path, self._fps = path, fps
        self._writer = None

    def append_data(self, frame):
        import cv2
        if self._writer is None:
            h, w = frame.shape[:2]
            self._writer = cv2.VideoWriter(
                self._path, cv2.VideoWriter_fourcc(*'mp4v'),
                self._fps, (w, h))
        self._writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    def close(self):
        if self._writer is not None:
            self._writer.release()


def detect_video(engine, dataset, video_path: str,
                 out_path: str = None, max_frames: int = None,
                 log_fn=print) -> str:
    """Annotate a video with per-frame pose estimates."""
    import jax.numpy as jnp

    cfg = engine.config
    if engine.state is None:
        engine.initialize()
    if out_path is None:
        base, _ = os.path.splitext(video_path)
        out_path = base + '_annotated.mp4'

    frame_conv = 'unreal' if dataset.name == 'Urso' else 'camera'
    reader = _Cv2Reader(video_path)
    writer = _Cv2Writer(out_path, reader.fps)

    bs = cfg.BATCH_SIZE
    buf = []
    n_done = 0

    def flush(buf):
        nonlocal n_done
        if not buf:
            return
        pad = bs - len(buf)
        batch = buf + [buf[-1]] * pad
        molded, metas, _ = engine.mold_inputs(batch)
        raw = engine.predict_molded(molded)
        raw = {k: np.asarray(v)[:len(buf)] for k, v in raw.items()}
        locs, qs = decode_results(raw, cfg, dataset)
        for i, frame in enumerate(buf):
            writer.append_data(_overlay_axes(
                frame, dataset.camera.K, locs[i], qs[i], frame_conv))
            n_done += 1
        buf.clear()

    for frame in reader:
        if frame.ndim == 2:
            frame = np.stack([frame] * 3, axis=-1)
        buf.append(frame[..., :3])
        if len(buf) == bs:
            flush(buf)
        if max_frames and n_done + len(buf) >= max_frames:
            break
    flush(buf)
    writer.close()
    reader.close()
    log_fn(f"Annotated video written to {out_path} ({n_done} frames)")
    return out_path
