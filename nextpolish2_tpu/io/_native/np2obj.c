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

/* collect_score_jobs(lqseqs, ksize, invalid)
 *   -> (long_refs, long_seqs, single_refs, single_hashes)
 * One C pass over every region's seqs list partitioning alleles for
 * retrieve_kmer_count (main.rs:740-778 batching): len(seq) > ksize alleles
 * go to the batched rolling-scan lists; <= ksize alleles with a valid
 * precomputed hash go to the single-hash lists. The equivalent Python loop
 * costs ~0.14 s per 100 kb iteration (~300k list appends + attribute
 * loads); raises TypeError when an item is not the C LqSeq (the dataclass
 * spec path) so the caller can fall back to the Python loop. */
static PyObject *collect_score_jobs(PyObject *self, PyObject *args) {
    PyObject *lqseqs;
    long long ksize;
    unsigned long long invalid;
    if (!PyArg_ParseTuple(args, "OLK", &lqseqs, &ksize, &invalid))
        return NULL;
    PyObject *seq_lists = PySequence_Fast(lqseqs, "lqseqs not a sequence");
    if (!seq_lists) return NULL;
    PyObject *long_refs = PyList_New(0), *long_seqs = PyList_New(0);
    PyObject *single_refs = PyList_New(0), *single_hashes = PyList_New(0);
    PyObject *ret = NULL;
    if (!long_refs || !long_seqs || !single_refs || !single_hashes) goto done;
    {
        Py_ssize_t R = PySequence_Fast_GET_SIZE(seq_lists);
        for (Py_ssize_t r = 0; r < R; r++) {
            PyObject *region = PySequence_Fast_GET_ITEM(seq_lists, r);
            PyObject *seqs = PyObject_GetAttrString(region, "seqs");
            if (!seqs) goto done;
            if (!PyList_Check(seqs)) {
                Py_DECREF(seqs);
                PyErr_SetString(PyExc_TypeError, "seqs not a list");
                goto done;
            }
            Py_ssize_t S = PyList_GET_SIZE(seqs);
            for (Py_ssize_t i = 0; i < S; i++) {
                PyObject *item = PyList_GET_ITEM(seqs, i);
                if (!PyObject_TypeCheck(item, &LqSeqType)) {
                    Py_DECREF(seqs);
                    PyErr_SetString(PyExc_TypeError, "not a C LqSeq");
                    goto done;
                }
                LqSeqObj *o = (LqSeqObj *)item;
                Py_ssize_t slen = PyBytes_Check(o->seq)
                    ? PyBytes_GET_SIZE(o->seq) : PyObject_Length(o->seq);
                if (slen < 0) {  /* length-less seq: propagate, don't
                                    misclassify with an exception pending */
                    Py_DECREF(seqs);
                    goto done;
                }
                int rc = 0;
                if (slen > ksize) {
                    rc = PyList_Append(long_refs, item) < 0
                        || PyList_Append(long_seqs, o->seq) < 0;
                } else if (o->kmer != invalid) {
                    PyObject *h = PyLong_FromUnsignedLongLong(o->kmer);
                    rc = !h || PyList_Append(single_refs, item) < 0
                        || PyList_Append(single_hashes, h) < 0;
                    Py_XDECREF(h);
                }
                if (rc) { Py_DECREF(seqs); goto done; }
            }
            Py_DECREF(seqs);
        }
    }
    ret = PyTuple_Pack(4, long_refs, long_seqs, single_refs, single_hashes);
done:
    Py_XDECREF(long_refs);
    Py_XDECREF(long_seqs);
    Py_XDECREF(single_refs);
    Py_XDECREF(single_hashes);
    Py_DECREF(seq_lists);
    return ret;
}

/* assign_kscores(refs, scores_i64_buffer) -> None
 * refs[i].kscore = scores[i] in one C loop (the zip-assign twin). */
static PyObject *assign_kscores(PyObject *self, PyObject *args) {
    PyObject *refs;
    Py_buffer scores;
    if (!PyArg_ParseTuple(args, "O!y*", &PyList_Type, &refs, &scores))
        return NULL;
    Py_ssize_t n = PyList_GET_SIZE(refs);
    PyObject *ret = NULL;
    if (scores.len != 8 * n) {
        PyErr_SetString(PyExc_ValueError, "assign_kscores: length mismatch");
        goto done;
    }
    {
        const int64_t *sc = (const int64_t *)scores.buf;
        for (Py_ssize_t i = 0; i < n; i++) {
            PyObject *item = PyList_GET_ITEM(refs, i);
            if (!PyObject_TypeCheck(item, &LqSeqType)) {
                PyErr_SetString(PyExc_TypeError, "not a C LqSeq");
                goto done;
            }
            ((LqSeqObj *)item)->kscore = sc[i];
        }
    }
    Py_INCREF(Py_None);
    ret = Py_None;
done:
    PyBuffer_Release(&scores);
    return ret;
}

static PyMethodDef np2obj_methods[] = {
    {"build_lqseqs", build_lqseqs, METH_VARARGS,
     "Bulk-create LqSeq objects from extraction arrays into per-region lists"},
    {"collect_score_jobs", collect_score_jobs, METH_VARARGS,
     "Partition every region's alleles into batched/single scoring job lists"},
    {"assign_kscores", assign_kscores, METH_VARARGS,
     "refs[i].kscore = scores_i64[i] in one C loop"},
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
