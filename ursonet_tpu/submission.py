"""ESA challenge submission writer (reference submission.py:5-51) and the
test_and_submit driver (reference pose_estimator.py:217-318).

Output parity: `submission_{suffix}.csv` rows of
[filename, q_scalar_first(4), r(3)], synthetic test set first then real
test set, each sorted by filename; quaternions are re-ordered from the
internal scalar-last convention to ESA scalar-first on append
(pose_estimator.py:268,313).
"""

from __future__ import annotations

import csv
import os
from datetime import datetime
from typing import Optional


class SubmissionWriter:
    """Collects per-image results and exports the ESA CSV."""

    def __init__(self):
        self.test_results = []
        self.real_test_results = []

    def _append(self, filename, q, r, real: bool):
        entry = {'filename': filename, 'q': list(q), 'r': list(r)}
        (self.real_test_results if real else self.test_results).append(entry)

    def append_test(self, filename, q, r):
        self._append(filename, q, r, real=False)

    def append_real_test(self, filename, q, r):
        self._append(filename, q, r, real=True)

    def export(self, out_dir: str = '', suffix: Optional[str] = None) -> str:
        sorted_test = sorted(self.test_results, key=lambda k: k['filename'])
        sorted_real = sorted(self.real_test_results,
                             key=lambda k: k['filename'])
        if suffix is None:
            suffix = datetime.now().strftime("%Y%m%d-%H%M")
        path = os.path.join(out_dir, f"submission_{suffix}.csv")
        with open(path, 'w') as f:
            w = csv.writer(f, lineterminator='\n')
            for result in (sorted_test + sorted_real):
                w.writerow([result['filename'],
                            *(result['q'] + result['r'])])
        print(f"Submission saved to {path}.")
        return path


def test_and_submit(engine, dataset_virtual, dataset_real,
                    out_dir: str = '', suffix: Optional[str] = None) -> str:
    """Run inference over both SPEED test sets and export the submission
    (reference test_and_submit, pose_estimator.py:217-318). Decoding is
    batched on device (evaluate._batched_forward / decode_results)."""
    import numpy as np

    from ursonet_tpu.evaluate import _batched_forward, decode_results

    writer = SubmissionWriter()
    for dataset, append in ((dataset_virtual, writer.append_test),
                            (dataset_real, writer.append_real_test)):
        if dataset is None or len(dataset.image_ids) == 0:
            continue
        ids = list(dataset.image_ids)
        outputs = _batched_forward(engine, dataset, ids)
        locs, qs = decode_results(outputs, engine.config, dataset)
        for n, i in enumerate(ids):
            filename = os.path.basename(dataset.image_info[i]['path'])
            q = np.asarray(qs[n], np.float64)
            # scalar-last (internal) -> scalar-first (ESA)
            q_esa = [q[3], q[0], q[1], q[2]]
            append(filename, q_esa, list(np.asarray(locs[n], np.float64)))
    return writer.export(out_dir, suffix)
