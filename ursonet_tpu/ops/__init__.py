"""Compute-path ops: encoders, decoding, image transforms, augmentation."""
