"""Natural (SuiteSparse) matrix suite tooling.

The reference downloads 26 SuiteSparse matrices from cise.ufl.edu and flattens the
tarballs (/root/reference/matrix/natural/download.sh:1-32, decompress.sh).  Same
suite here, pointed at the current sparse.tamu.edu mirror; environments without
egress can stage tarballs manually (``ensure_suite`` reports what is missing) or
substitute statistically similar matrices with ``synthesize`` (power-law + band
mixes matched to each matrix's published shape/nnz).
"""
from __future__ import annotations

import os
import tarfile
import urllib.request
from typing import Dict, List, Optional

# group/name pairs from the reference's download.sh.
NATURAL_SUITE = [
    ("Sandia", "ASIC_680ks"), ("Muite", "Chebyshev4"),
    ("Freescale", "Freescale1"), ("Freescale", "FullChip"),
    ("Janna", "ML_Geer"), ("Fluorem", "PR02R"), ("Fluorem", "RM07R"),
    ("TSOPF", "TSOPF_RS_b2383_c1"), ("vanHeukelum", "cage15"),
    ("Freescale", "circuit5M"), ("Williams", "mac_econ_fwd500"),
    ("Schenk_ISEI", "ohne2"), ("Simon", "raefsky3"), ("Rajat", "rajat31"),
    ("Norris", "stomach"), ("Botonakis", "thermomech_dK"),
    ("Norris", "torso1"), ("FEMLAB", "sme3Dc"), ("Hamrle", "Hamrle3"),
    ("Ronis", "xenon2"), ("Raju", "laminar_duct3D"),
    ("Schenk_ISEI", "para-4"), ("Williams", "webbase-1M"),
    ("ATandT", "twotone"), ("Mallya", "lhr34"), ("Hollinger", "g7jac200sc"),
]

MIRROR = "https://suitesparse-collection-website.herokuapp.com/MM"

# (n_row, n_col, nnz) from the SuiteSparse collection — used by synthesize().
# All 26 suite matrices carry a structural recipe in data.structgen.RECIPES.
from .structgen import RECIPES as _RECIPES  # noqa: E402

PUBLISHED_SHAPES: Dict[str, tuple] = {
    name: (n, n, nnz) for name, (n, nnz, _) in _RECIPES.items()
}


def url_for(group: str, name: str) -> str:
    return f"{MIRROR}/{group}/{name}.tar.gz"


def extract_mtx(tar_path: str, dest_dir: str) -> Optional[str]:
    """Extract <name>/<name>.mtx from a SuiteSparse tarball, flattened."""
    name = os.path.basename(tar_path).replace(".tar.gz", "")
    out = os.path.join(dest_dir, f"{name}.mtx")
    with tarfile.open(tar_path, "r:gz") as tf:
        for m in tf.getmembers():
            if m.name.endswith(f"{name}.mtx"):
                src = tf.extractfile(m)
                with open(out, "wb") as f:
                    while True:
                        chunk = src.read(1 << 20)
                        if not chunk:
                            break
                        f.write(chunk)
                return out
    return None


def ensure_suite(dest_dir: str, *, download: bool = True,
                 subset: Optional[List[str]] = None, log=print) -> dict:
    """Make <dest>/<name>.mtx exist for each suite matrix; returns status map."""
    os.makedirs(dest_dir, exist_ok=True)
    status = {}
    for group, name in NATURAL_SUITE:
        if subset and name not in subset:
            continue
        out = os.path.join(dest_dir, f"{name}.mtx")
        if os.path.exists(out):
            status[name] = "present"
            continue
        tar = os.path.join(dest_dir, f"{name}.tar.gz")
        if not os.path.exists(tar) and download:
            try:
                log(f"downloading {name} ...")
                urllib.request.urlretrieve(url_for(group, name), tar)
            except Exception as e:
                status[name] = f"download failed: {e}"
                continue
        if os.path.exists(tar):
            got = extract_mtx(tar, dest_dir)
            status[name] = "extracted" if got else "extract failed"
        else:
            status[name] = "missing (no egress? stage the tarball manually)"
    return status


def synthesize(name: str, *, seed: int = 0, structured: bool = True):
    """Stand-in for a suite matrix for egress-less perf work.

    ``structured=True`` (default) builds the structure-matched stand-in from
    data.structgen (FEM block bands, stencils, circuit mixes... per the
    matrix's published problem class); ``structured=False`` keeps the round-1
    shape+nnz-matched pure power-law (erases locality — the hardest case).
    """
    import zlib

    from .generators import powerlaw

    if structured:
        from .structgen import synthesize_structured

        return synthesize_structured(name, seed=seed)
    if name not in PUBLISHED_SHAPES:
        raise KeyError(f"no published shape for {name!r}")
    n_row, n_col, nnz = PUBLISHED_SHAPES[name]
    # crc32, not hash(): str hash is salted per process (PYTHONHASHSEED), and
    # the stand-ins behind committed suite numbers must be reproducible.
    return powerlaw(n_row, nnz, seed=seed + zlib.crc32(name.encode()) % 1000)
