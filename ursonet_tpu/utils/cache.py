"""Persistent XLA compilation cache.

Each (dataset, image_scale, resize-mode, model) combination is one
compiled program (SURVEY.md §7 'static shapes vs --image_scale'); on the
remote-TPU platform a ResNet-sized compile costs 60–95 s. Enabling JAX's
persistent cache makes every repeat run (re-training, evaluate after
train, resumes, benchmarks) start in seconds.

Called from the engine and the CLI; idempotent; opt out with
URSONET_NO_COMPILATION_CACHE=1 or an explicit dir via
JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser('~/.cache/ursonet_tpu_xla')
_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    global _enabled
    if _enabled:
        return True
    if os.environ.get('URSONET_NO_COMPILATION_CACHE') == '1':
        return False
    import jax
    cache_dir = (cache_dir or os.environ.get('JAX_COMPILATION_CACHE_DIR'))
    try:
        if cache_dir is None:
            # Segregate by backend + XLA_FLAGS: XLA's CPU AOT entries record
            # the flag-dependent target features of the *writing* process;
            # loading them from a process with different flags (e.g. the
            # virtual-8-device test env vs a TPU-tunnel session's host CPU
            # backend) can SIGILL/abort. One subdir per environment makes
            # cross-environment poisoning impossible.
            # jax.default_backend() initializes the backend and RAISES when
            # the TPU tunnel is unclaimable (BENCH_r02 died here) — it must
            # stay inside this try so callers degrade to no-cache instead
            # of crashing before their own error handling.
            # The tag must also carry the *host machine's* identity: XLA's
            # CPU AOT blobs bake in the compiling host's CPU features
            # (avx512 etc.), and a cache dir shared across machines (same
            # backend, same flags) feeds one host another host's code —
            # observed as cpu_aot_loader "machine type doesn't match"
            # errors when this repo moved between boxes mid-round.
            import hashlib
            backend = jax.default_backend()
            flags = ''
            if backend == 'cpu':
                try:
                    with open('/proc/cpuinfo') as f:
                        flags = next(
                            (ln for ln in f if ln.startswith('flags')), '')
                except OSError:
                    import platform
                    flags = platform.processor() or platform.machine()
            # Plain concatenation (no separator): when flags == '' the
            # hash input is byte-identical to what earlier rounds wrote,
            # so existing TPU cache entries stay warm.
            tag = (backend + '-' + hashlib.sha1(
                (os.environ.get('XLA_FLAGS', '') + flags)
                .encode()).hexdigest()[:8])
            cache_dir = os.path.join(_DEFAULT_DIR, tag)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        _enabled = True
    except Exception:
        return False
    return True
