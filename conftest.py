# repo-root conftest: make sobfu_tpu importable when pytest runs from root
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
