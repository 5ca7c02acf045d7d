"""`python -m sobfu_tpu` — the reconstruction CLI (see sobfu_tpu.cli)."""

import os

# BEFORE any sobfu_tpu/jax import (jax reads the env var at import time):
# without the persistent cache every CLI invocation re-pays the
# whole-frame-jit compile (~45 s at 128^3 through the remote helper —
# measured 20x the actual frame work)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser(
    os.environ.get("SOBFU_CACHE_DIR", "~/.cache/jax")))

from sobfu_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
