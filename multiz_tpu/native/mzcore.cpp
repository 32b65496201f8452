// Native host runtime for multiz_tpu: the hot host-side paths around the
// device DP kernel, as a CPython extension (buffer protocol only — no
// numpy C API, so it builds with just g++ + Python headers).
//
// The reference implements these in C as part of its single address space
// (mz_yama.c:257-313 traceback + rebuild; the per-cell stats gathering is
// implicit in its K*L inner loops). Here they are the host runtime feeding
// the TPU kernel:
//   * colstats_into — per-column base histograms / dash counts / adjacent
//     dash-pair counts, written straight into the pre-allocated stacked
//     batch operands (zero-copy bucket packing).
//   * traceback_into — edit-script extraction over the flag matrix
//     (mz_yama.c:257-291), for the host oracle path.
//   * replay_into — edit script -> merged (K+L)-row column matrix
//     (mz_yama.c:294-309).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>

namespace {

constexpr uint8_t FLAG_C = 0;
constexpr uint8_t FLAG_I = 1;
constexpr uint8_t FLAG_D = 2;
constexpr uint8_t SELECT_CID = 3;
constexpr uint8_t DASH = '-';

struct Buf {
    Py_buffer view{};
    bool ok = false;
    Buf(PyObject* obj, int flags) { ok = PyObject_GetBuffer(obj, &view, flags) == 0; }
    ~Buf() { if (ok) PyBuffer_Release(&view); }
    uint8_t* u8() const { return static_cast<uint8_t*>(view.buf); }
    int32_t* i32() const { return static_cast<int32_t*>(view.buf); }
    Py_ssize_t len() const { return view.len; }
};

// colstats_into(X, ncol, nrow, cat, hist, nond, ndash, pair)
//   X:    uint8 (ncol, nrow) C-contiguous
//   cat:  int8[256] byte -> category (6 categories)
//   hist: int32 (pad, 6); nond/ndash: int32 (pad,); pair: int32 (pad, 4)
// Rows 1..ncol are written; row 0 and padding are left untouched.
PyObject* colstats_into(PyObject*, PyObject* args) {
    PyObject *xo, *cato, *histo, *nondo, *ndasho, *pairo;
    Py_ssize_t ncol, nrow;
    if (!PyArg_ParseTuple(args, "OnnOOOOO", &xo, &ncol, &nrow, &cato,
                          &histo, &nondo, &ndasho, &pairo))
        return nullptr;
    Buf X(xo, PyBUF_SIMPLE), cat(cato, PyBUF_SIMPLE);
    Buf hist(histo, PyBUF_WRITABLE), nond(nondo, PyBUF_WRITABLE),
        ndash(ndasho, PyBUF_WRITABLE), pair(pairo, PyBUF_WRITABLE);
    if (!X.ok || !cat.ok || !hist.ok || !nond.ok || !ndash.ok || !pair.ok)
        return nullptr;
    if (X.len() < ncol * nrow || cat.len() < 256) {
        PyErr_SetString(PyExc_ValueError, "colstats_into: bad buffer sizes");
        return nullptr;
    }
    const uint8_t* x = X.u8();
    const int8_t* c8 = reinterpret_cast<const int8_t*>(cat.u8());
    int32_t* h = hist.i32();
    int32_t* n0 = nond.i32();
    int32_t* n1 = ndash.i32();
    int32_t* pr = pair.i32();
    for (Py_ssize_t i = 1; i <= ncol; ++i) {
        const uint8_t* col = x + (i - 1) * nrow;
        int32_t hc[6] = {0, 0, 0, 0, 0, 0};
        int32_t dash = 0;
        for (Py_ssize_t r = 0; r < nrow; ++r) {
            uint8_t b = col[r];
            hc[c8[b]] += 1;
            dash += (b == DASH);
        }
        for (int k = 0; k < 6; ++k) h[i * 6 + k] = hc[k];
        n1[i] = dash;
        n0[i] = (int32_t)nrow - dash;
        if (i == 1) {
            pr[4 + 0] = n0[1];
            pr[4 + 1] = n1[1];
            pr[4 + 2] = 0;
            pr[4 + 3] = 0;
        } else {
            const uint8_t* prev = col - nrow;
            int32_t p[4] = {0, 0, 0, 0};
            for (Py_ssize_t r = 0; r < nrow; ++r) {
                int f = prev[r] == DASH;
                int s = col[r] == DASH;
                p[(f << 1) | s] += 1;
            }
            for (int k = 0; k < 4; ++k) pr[i * 4 + k] = p[k];
        }
    }
    Py_RETURN_NONE;
}

// traceback_into(flags, M, N, C, D, I, script_out) -> nedit
//   flags: uint8 (M+1, N+1) C-contiguous; script_out: uint8 (M+N,)
//   Writes ops newest-first (walking back from (M,N)), like the C's
//   script buffer before reversal (mz_yama.c:257-291).
PyObject* traceback_into(PyObject*, PyObject* args) {
    PyObject *fo, *so;
    Py_ssize_t M, N;
    long C, D, I;
    if (!PyArg_ParseTuple(args, "OnnlllO", &fo, &M, &N, &C, &D, &I, &so))
        return nullptr;
    Buf F(fo, PyBUF_SIMPLE), S(so, PyBUF_WRITABLE);
    if (!F.ok || !S.ok) return nullptr;
    if (F.len() < (M + 1) * (N + 1) || S.len() < M + N) {
        PyErr_SetString(PyExc_ValueError, "traceback_into: bad buffer sizes");
        return nullptr;
    }
    const uint8_t* flags = F.u8();
    uint8_t* script = S.u8();
    const Py_ssize_t ld = N + 1;
    uint8_t node;
    if (C >= D && C >= I) node = FLAG_C;
    else if (D >= I) node = FLAG_D;
    else node = FLAG_I;
    Py_ssize_t row = M, col = N, nedit = 0;
    while (row > 0 || col > 0) {
        if (row < 0 || col < 0) {
            PyErr_SetString(PyExc_ValueError, "Error generating edit script.");
            return nullptr;
        }
        uint8_t st = flags[row * ld + col];
        script[nedit++] = node;
        if (node == FLAG_I) {
            col -= 1;
            node = st >> 4;
        } else if (node == FLAG_D) {
            row -= 1;
            node = (st >> 2) & SELECT_CID;
        } else if (node == FLAG_C) {
            row -= 1;
            col -= 1;
            node = st & SELECT_CID;
        } else {
            PyErr_SetString(PyExc_ValueError, "illegal node type in traceback");
            return nullptr;
        }
    }
    return PyLong_FromSsize_t(nedit);
}

// replay_into(script, n, reversed, A, M, K, B, N, L, out)
//   script: uint8 ops; if reversed != 0 the ops are newest-first (walked
//   back-to-front), else oldest-first. A: (M, K) uint8; B: (N, L) uint8;
//   out: (n, K+L) uint8, fully overwritten.
PyObject* replay_into(PyObject*, PyObject* args) {
    PyObject *so, *ao, *bo, *oo;
    Py_ssize_t n, M, K, N, L;
    int reversed_;
    if (!PyArg_ParseTuple(args, "OnpOnnOnnO", &so, &n, &reversed_, &ao, &M,
                          &K, &bo, &N, &L, &oo))
        return nullptr;
    Buf S(so, PyBUF_SIMPLE), A(ao, PyBUF_SIMPLE), B(bo, PyBUF_SIMPLE),
        O(oo, PyBUF_WRITABLE);
    if (!S.ok || !A.ok || !B.ok || !O.ok) return nullptr;
    const Py_ssize_t W = K + L;
    if (S.len() < n || A.len() < M * K || B.len() < N * L ||
        O.len() < n * W) {
        PyErr_SetString(PyExc_ValueError, "replay_into: bad buffer sizes");
        return nullptr;
    }
    const uint8_t* script = S.u8();
    const uint8_t* a = A.u8();
    const uint8_t* b = B.u8();
    uint8_t* out = O.u8();
    Py_ssize_t ai = 0, bi = 0;
    for (Py_ssize_t t = 0; t < n; ++t) {
        uint8_t op = script[reversed_ ? n - 1 - t : t];
        uint8_t* row = out + t * W;
        if (op != FLAG_I) {  // C or D consume a column of A
            if (ai >= M) goto bad;
            std::memcpy(row, a + ai * K, K);
            ++ai;
        } else {
            std::memset(row, DASH, K);
        }
        if (op != FLAG_D) {  // C or I consume a column of B
            if (bi >= N) goto bad;
            std::memcpy(row + K, b + bi * L, L);
            ++bi;
        } else {
            std::memset(row + K, DASH, L);
        }
    }
    if (ai != M || bi != N) goto bad;
    Py_RETURN_NONE;
bad:
    PyErr_SetString(PyExc_ValueError,
                    "new_align: script does not consume A and B exactly");
    return nullptr;
}

PyMethodDef methods[] = {
    {"colstats_into", colstats_into, METH_VARARGS,
     "per-column stats into pre-allocated int32 buffers"},
    {"traceback_into", traceback_into, METH_VARARGS,
     "edit-script extraction (newest-first); returns nedit"},
    {"replay_into", replay_into, METH_VARARGS,
     "edit script -> merged column matrix"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_mzcore",
    "native host runtime for multiz_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__mzcore(void) { return PyModule_Create(&moduledef); }
