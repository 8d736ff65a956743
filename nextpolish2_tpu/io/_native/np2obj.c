/* CPython extension: fast LqSeq object type + bulk builder.
 *
 * The LQ candidate-allele stage (reference hot loop 3, main.rs:1440-1523)
 * materializes ~150k LqSeq records per 100 kb contig iteration. Constructing
 * them through the Python dataclass costs ~1.7 us each (ceval + boxing of
 * u64 hashes); this module provides (a) a C slot type with the same four
 * attributes (order, kscore, kmer, seq — kscore/kmer/seq writable, matching
 * how retrieve_kmer_count and mark_hete mutate them) and (b) build_lqseqs(),
 * which creates the objects straight from the native extraction pass's
 * output arrays and appends them to the per-region seqs lists in one C loop.
 *
 * models/oracle_lq.py keeps the @dataclass twin as the executable spec and
 * falls back to it when this module is unavailable.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>
#include <stdint.h>
#include <string.h>

typedef struct {
    PyObject_HEAD
    long long order;
    long long kscore;
    unsigned long long kmer;
    PyObject *seq; /* bytes */
} LqSeqObj;

static void LqSeq_dealloc(LqSeqObj *self) {
    Py_XDECREF(self->seq);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static int LqSeq_init(LqSeqObj *self, PyObject *args, PyObject *kwds) {
    static char *kwlist[] = {"order", "kscore", "kmer", "seq", NULL};
    PyObject *seq = NULL;
    if (!PyArg_ParseTupleAndKeywords(args, kwds, "LLKO", kwlist, &self->order,
                                     &self->kscore, &self->kmer, &seq))
        return -1;
    Py_INCREF(seq);
    Py_XSETREF(self->seq, seq);
    return 0;
}

static PyObject *LqSeq_repr(LqSeqObj *self) {
    return PyUnicode_FromFormat("LqSeq(order=%lld, kscore=%lld, kmer=%llu, seq=%R)",
                                self->order, self->kscore, self->kmer,
                                self->seq ? self->seq : Py_None);
}

static PyMemberDef LqSeq_members[] = {
    {"order", T_LONGLONG, offsetof(LqSeqObj, order), 0, "alignment index"},
    {"kscore", T_LONGLONG, offsetof(LqSeqObj, kscore), 0, "min yak count"},
    {"kmer", T_ULONGLONG, offsetof(LqSeqObj, kmer), 0, "full yak hash or INVALID"},
    {"seq", T_OBJECT_EX, offsetof(LqSeqObj, seq), 0, "allele bytes"},
    {NULL},
};

static PyTypeObject LqSeqType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "np2obj.LqSeq",
    .tp_basicsize = sizeof(LqSeqObj),
    .tp_dealloc = (destructor)LqSeq_dealloc,
    .tp_repr = (reprfunc)LqSeq_repr,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_doc = "Candidate allele of an LQ interval (C twin of the "
              "oracle_lq.LqSeq dataclass spec)",
    .tp_members = LqSeq_members,
    .tp_init = (initproc)LqSeq_init,
    .tp_new = PyType_GenericNew,
};

/* build_lqseqs(sinks, region_i32, order_i32, kmer_u64, has_u8, soff_i64,
 *              seq_bytes, invalid) -> None
 * sinks: list (len R) of the per-region seqs lists. Entry i appends
 * LqSeq(order[i], 0, has[i] ? kmer[i] : invalid, seq_bytes[soff[i]:soff[i+1]])
 * to sinks[region[i]]. All arrays are C-contiguous little-endian buffers. */
static PyObject *build_lqseqs(PyObject *self, PyObject *args) {
    PyObject *sinks;
    Py_buffer region, order, kmer, has, soff, seqb;
    unsigned long long invalid;
    if (!PyArg_ParseTuple(args, "O!y*y*y*y*y*y*K", &PyList_Type, &sinks,
                          &region, &order, &kmer, &has, &soff, &seqb,
                          &invalid))
        return NULL;
    PyObject *ret = NULL;
    Py_ssize_t M = region.len / 4;
    if (order.len != 4 * M || kmer.len != 8 * M || has.len != M ||
        soff.len != 8 * (M + 1)) {
        PyErr_SetString(PyExc_ValueError, "build_lqseqs: array length mismatch");
        goto done;
    }
    {
        const int32_t *reg = (const int32_t *)region.buf;
        const int32_t *ord = (const int32_t *)order.buf;
        const uint64_t *km = (const uint64_t *)kmer.buf;
        const uint8_t *hs = (const uint8_t *)has.buf;
        const int64_t *so = (const int64_t *)soff.buf;
        const char *sb = (const char *)seqb.buf;
        Py_ssize_t R = PyList_GET_SIZE(sinks);
        for (Py_ssize_t i = 0; i < M; i++) {
            int32_t r = reg[i];
            int64_t s0 = so[i], s1 = so[i + 1];
            if (r < 0 || r >= R || s0 < 0 || s1 < s0 || s1 > seqb.len) {
                PyErr_SetString(PyExc_ValueError, "build_lqseqs: bad index");
                goto done;
            }
            LqSeqObj *o = PyObject_New(LqSeqObj, &LqSeqType);
            if (!o) goto done;
            o->order = ord[i];
            o->kscore = 0;
            o->kmer = hs[i] ? km[i] : invalid;
            o->seq = PyBytes_FromStringAndSize(sb + s0, s1 - s0);
            if (!o->seq) { Py_DECREF(o); goto done; }
            PyObject *lst = PyList_GET_ITEM(sinks, r);
            if (!PyList_Check(lst)) {
                Py_DECREF(o);
                PyErr_SetString(PyExc_TypeError, "build_lqseqs: sink not a list");
                goto done;
            }
            int rc = PyList_Append(lst, (PyObject *)o);
            Py_DECREF(o);
            if (rc < 0) goto done;
        }
    }
    Py_INCREF(Py_None);
    ret = Py_None;
done:
    PyBuffer_Release(&region);
    PyBuffer_Release(&order);
    PyBuffer_Release(&kmer);
    PyBuffer_Release(&has);
    PyBuffer_Release(&soff);
    PyBuffer_Release(&seqb);
    return ret;
}

static PyMethodDef np2obj_methods[] = {
    {"build_lqseqs", build_lqseqs, METH_VARARGS,
     "Bulk-create LqSeq objects from extraction arrays into per-region lists"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef np2obj_module = {
    PyModuleDef_HEAD_INIT, "np2obj",
    "Fast LqSeq object type + bulk builder (see module docstring in the .c)",
    -1, np2obj_methods,
};

PyMODINIT_FUNC PyInit_np2obj(void) {
    if (PyType_Ready(&LqSeqType) < 0) return NULL;
    PyObject *m = PyModule_Create(&np2obj_module);
    if (!m) return NULL;
    Py_INCREF(&LqSeqType);
    if (PyModule_AddObject(m, "LqSeq", (PyObject *)&LqSeqType) < 0) {
        Py_DECREF(&LqSeqType);
        Py_DECREF(m);
        return NULL;
    }
    return m;
}
