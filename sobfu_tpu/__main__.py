"""`python -m sobfu_tpu` — the reconstruction CLI (see sobfu_tpu.cli)."""

from sobfu_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
