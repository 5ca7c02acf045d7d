"""One-time extraction of the canonical marching-cubes lookup tables.

The edge/triangle/vertex-count tables are the standard public-domain
constants from Lorensen & Cline (1987) as tabulated by Paul Bourke
("Polygonising a scalar field"); they appear byte-identically in PCL, the
CUDA SDK samples, and the reference (src/kfusion/marching_cubes.cpp:80-368).
They are pure data — any correct MC implementation uses the same numbers —
so we extract them once into a binary .npz consumed by sobfu_tpu.mc and
cross-validate their internal consistency (numVerts == popcount-derived
triangle counts; edge table consistent with triTable edges).

Usage: python tools/extract_mc_tables.py <path-to-marching_cubes.cpp> <out.npz>
"""

import re
import sys

import numpy as np


def extract_int_arrays(text: str):
    """Pull the three const int arrays out of the C++ source."""
    tables = {}
    for name in ["edgeTable", "triTable", "numVertsTable"]:
        m = re.search(
            rf"const int {name}\s*(?:\[[0-9]*\])+\s*=\s*\{{(.*?)\}};",
            text,
            re.S,
        )
        if not m:
            raise SystemExit(f"table {name} not found")
        nums = [int(tok, 0) for tok in re.findall(r"-?(?:0x[0-9a-fA-F]+|\d+)", m.group(1))]
        tables[name] = np.asarray(nums, dtype=np.int32)
    return tables


def validate(edge, tri, num_verts):
    assert edge.shape == (256,)
    tri = tri.reshape(256, 16)
    assert num_verts.shape == (256,)
    for ci in range(256):
        row = tri[ci]
        n = int(np.argmax(row < 0)) if (row < 0).any() else 16
        assert n % 3 == 0, (ci, row)
        assert n == num_verts[ci], (ci, n, num_verts[ci])
        # every referenced edge must be flagged in the edge table
        for e in row[:n]:
            assert 0 <= e < 12
            assert edge[ci] & (1 << int(e)), (ci, e)
    # complement symmetry of the edge table
    assert (edge == edge[::-1]).all()
    return tri


def main():
    src, out = sys.argv[1], sys.argv[2]
    with open(src) as f:
        text = f.read()
    t = extract_int_arrays(text)
    tri = validate(t["edgeTable"], t["triTable"], t["numVertsTable"])
    np.savez_compressed(
        out,
        edge_table=t["edgeTable"],
        tri_table=tri,
        num_verts_table=t["numVertsTable"],
    )
    print(f"wrote {out}: edge {t['edgeTable'].shape}, tri {tri.shape}, "
          f"numVerts {t['numVertsTable'].shape}")


if __name__ == "__main__":
    main()
