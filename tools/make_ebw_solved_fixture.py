#!/usr/bin/env python3
"""Generate SOLVED cross-implementation EBW fixtures (numpy only).

Writes problem zips in the reference's exact dump_problem_to_zip layout
(reference shared.py:136-155: moments.npy + x.npy|x.npz + w0.npy) plus a
sibling *_w.npy holding the expected optimal weights.

The expected weights need no solver at all — they are planted closed-form:
pick multipliers lambda*, set

    r_i = clip(exp(x_i . lambda*), lb, ub)      (clip only for the bounded
    w*_i = w0_i * r_i                            fixture; lb=0, ub=inf else)
    t    = (X' w*) / sum(w0)

Then (lambda*, w*) satisfies the KKT system of the entropy-balance program
min sum_i w0_i (r_i ln r_i - r_i + 1)  s.t.  X'(w0 r) = t * sum(w0),
lb <= r <= ub, which is strictly convex in w — so w* is THE unique
optimum, an engine-invariant mathematical fact rather than any solver's
float output. (The reference package itself is not runnable in this
sandbox — scipy/pypardiso/sparse_dot_mkl cannot install with zero egress —
but because the optimum is unique, any correct implementation, the
reference included, must return exactly these weights.)

Fixtures:
  ref_solved_dense.zip   n=80,  k=4 dense (intercept + 3 uniforms)
  ref_solved_sparse.zip  n=120, k=6 one-hot CSR (poststratification shape)
  ref_solved_bounded.zip n=80,  k=4 dense, ratio bounds (0.8, 1.25) that
                         genuinely BIND on a verified-nonzero row subset
Run: python3 tools/make_ebw_solved_fixture.py  (writes src/test/resources/)
"""
import io
import os
import zipfile

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")


def npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def write_zip(path, entries):
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        for name, data in entries:
            z.writestr(name, data)


def csr_npz_bytes(data, indices, indptr, shape):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("format.npy", npy_bytes(np.array(b"csr")))
        z.writestr("shape.npy", npy_bytes(np.array(shape, dtype=np.int64)))
        z.writestr("data.npy", npy_bytes(np.asarray(data, dtype=np.float64)))
        z.writestr("indices.npy", npy_bytes(np.asarray(indices, dtype=np.int32)))
        z.writestr("indptr.npy", npy_bytes(np.asarray(indptr, dtype=np.int32)))
    return buf.getvalue()


def plant(x, w0, lam, lb=0.0, ub=np.inf):
    r = np.clip(np.exp(x @ lam), lb, ub)
    w = w0 * r
    t = (x.T @ w) / w0.sum()
    return w, t, r


def main():
    rng = np.random.default_rng(20260815)

    # dense: intercept + 3 uniform features, heterogeneous w0
    n, k = 80, 4
    x = np.c_[np.ones(n), rng.uniform(-1.0, 1.0, size=(n, k - 1))]
    x = np.round(x, 6)
    w0 = np.round(rng.uniform(0.5, 2.0, size=n), 6)
    lam = np.array([0.05, 0.30, -0.20, 0.10])
    w, t, _ = plant(x, w0, lam)
    write_zip(os.path.join(OUT, "ref_solved_dense.zip"),
              [("moments.npy", npy_bytes(t)), ("x.npy", npy_bytes(x)),
               ("w0.npy", npy_bytes(w0))])
    open(os.path.join(OUT, "ref_solved_dense_w.npy"), "wb").write(npy_bytes(w))
    print("dense:   n=%d k=%d  max|resid|=%.2e" %
          (n, k, np.abs(x.T @ w - t * w0.sum()).max()))

    # sparse one-hot CSR: 6 poststratification cells, one per row
    n2, k2 = 120, 6
    cells = np.arange(n2) % k2
    w02 = np.round(rng.uniform(0.5, 2.0, size=n2), 6)
    lam2 = np.array([0.2, -0.1, 0.05, 0.3, -0.25, 0.0])
    x2 = np.zeros((n2, k2))
    x2[np.arange(n2), cells] = 1.0
    w2, t2, _ = plant(x2, w02, lam2)
    write_zip(os.path.join(OUT, "ref_solved_sparse.zip"),
              [("moments.npy", npy_bytes(t2)),
               ("x.npz", csr_npz_bytes(np.ones(n2), cells,
                                       np.arange(n2 + 1), (n2, k2))),
               ("w0.npy", npy_bytes(w02))])
    open(os.path.join(OUT, "ref_solved_sparse_w.npy"), "wb").write(npy_bytes(w2))
    print("sparse:  n=%d k=%d  max|resid|=%.2e" %
          (n2, k2, np.abs(x2.T @ w2 - t2 * w02.sum()).max()))

    # bounded: same dense shape, tighter multipliers so clip(0.8, 1.25)
    # binds on a real subset of rows (verified below)
    lam3 = np.array([0.02, 0.45, -0.40, 0.25])
    lb, ub = 0.8, 1.25
    w3, t3, r3 = plant(x, w0, lam3, lb, ub)
    n_lo = int((r3 <= lb).sum())
    n_hi = int((r3 >= ub).sum())
    assert n_lo > 5 and n_hi > 5, (n_lo, n_hi)
    write_zip(os.path.join(OUT, "ref_solved_bounded.zip"),
              [("moments.npy", npy_bytes(t3)), ("x.npy", npy_bytes(x)),
               ("w0.npy", npy_bytes(w0))])
    open(os.path.join(OUT, "ref_solved_bounded_w.npy"), "wb").write(npy_bytes(w3))
    print("bounded: n=%d k=%d  clipped lo=%d hi=%d  max|resid|=%.2e" %
          (n, k, n_lo, n_hi, np.abs(x.T @ w3 - t3 * w0.sum()).max()))


if __name__ == "__main__":
    main()
