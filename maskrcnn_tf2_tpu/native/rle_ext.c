/* COCO mask-RLE codec, C extension.
 *
 * The reference depends on pycocotools' C for all RLE work
 * (samples/coco/coco.py:356-442 via pycocotools.mask); this is the
 * framework's native equivalent of that dependency — same public COCO RLE
 * spec as the pure-numpy codec in data/coco.py (column-major runs starting
 * with a 0-run; compressed counts are base-48 6-bit varints with bit 5 as
 * continuation, sign extension via bit 4 of the final group, and runs > 2
 * delta-coded against counts[i-2]).
 *
 * Exposes:
 *   decode_counts(s: str) -> list[int]
 *   decode_mask(counts: str | sequence[int], h: int, w: int) -> bytes
 *       (h*w column-major uint8 buffer, clamped/padded to h*w)
 *
 * Built on demand by native/rle.py with the system compiler; the numpy
 * codec remains the always-available fallback.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <string.h>

static int
decode_counts_core(const char *s, Py_ssize_t n, int64_t **out, Py_ssize_t *m)
{
    Py_ssize_t cap = 256, cnt = 0, i = 0;
    int64_t *buf = (int64_t *)PyMem_Malloc((size_t)cap * sizeof(int64_t));
    if (!buf)
        return -1;
    while (i < n) {
        int64_t x = 0;
        int k = 0, more = 1;
        while (more) {
            if (i >= n) {
                PyMem_Free(buf);
                return -2; /* truncated varint */
            }
            int64_t c = (int64_t)(unsigned char)s[i++] - 48;
            x |= (c & 0x1F) << (5 * k);
            more = (int)(c & 0x20);
            k++;
            if (!more && (c & 0x10))
                x |= -1LL << (5 * k);
        }
        if (cnt > 2)
            x += buf[cnt - 2];
        if (cnt == cap) {
            cap *= 2;
            int64_t *nb =
                (int64_t *)PyMem_Realloc(buf, (size_t)cap * sizeof(int64_t));
            if (!nb) {
                PyMem_Free(buf);
                return -1;
            }
            buf = nb;
        }
        buf[cnt++] = x;
    }
    *out = buf;
    *m = cnt;
    return 0;
}

static int
counts_from_object(PyObject *obj, int64_t **out, Py_ssize_t *m)
{
    if (PyUnicode_Check(obj)) {
        Py_ssize_t n;
        const char *s = PyUnicode_AsUTF8AndSize(obj, &n);
        if (!s)
            return -1;
        int rc = decode_counts_core(s, n, out, m);
        if (rc == -1) {
            PyErr_NoMemory();
            return -1;
        }
        if (rc == -2) {
            PyErr_SetString(PyExc_ValueError, "truncated RLE counts string");
            return -1;
        }
        return 0;
    }
    PyObject *seq = PySequence_Fast(obj, "counts must be a str or a sequence");
    if (!seq)
        return -1;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    int64_t *buf = (int64_t *)PyMem_Malloc((size_t)(n > 0 ? n : 1) *
                                           sizeof(int64_t));
    if (!buf) {
        Py_DECREF(seq);
        PyErr_NoMemory();
        return -1;
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        buf[i] = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(seq, i));
        if (buf[i] == -1 && PyErr_Occurred()) {
            PyMem_Free(buf);
            Py_DECREF(seq);
            return -1;
        }
    }
    Py_DECREF(seq);
    *out = buf;
    *m = n;
    return 0;
}

static PyObject *
py_decode_counts(PyObject *self, PyObject *args)
{
    const char *s;
    Py_ssize_t n;
    if (!PyArg_ParseTuple(args, "s#", &s, &n))
        return NULL;
    int64_t *counts = NULL;
    Py_ssize_t m = 0;
    int rc = decode_counts_core(s, n, &counts, &m);
    if (rc == -1)
        return PyErr_NoMemory();
    if (rc == -2) {
        PyErr_SetString(PyExc_ValueError, "truncated RLE counts string");
        return NULL;
    }
    PyObject *list = PyList_New(m);
    if (!list) {
        PyMem_Free(counts);
        return NULL;
    }
    for (Py_ssize_t i = 0; i < m; i++) {
        PyObject *v = PyLong_FromLongLong(counts[i]);
        if (!v) {
            PyMem_Free(counts);
            Py_DECREF(list);
            return NULL;
        }
        PyList_SET_ITEM(list, i, v);
    }
    PyMem_Free(counts);
    return list;
}

static PyObject *
py_decode_mask(PyObject *self, PyObject *args)
{
    PyObject *obj;
    Py_ssize_t h, w;
    if (!PyArg_ParseTuple(args, "Onn", &obj, &h, &w))
        return NULL;
    if (h < 0 || w < 0) {
        PyErr_SetString(PyExc_ValueError, "h and w must be non-negative");
        return NULL;
    }
    int64_t *counts = NULL;
    Py_ssize_t m = 0;
    if (counts_from_object(obj, &counts, &m) != 0)
        return NULL;

    Py_ssize_t total = h * w;
    PyObject *bytes = PyBytes_FromStringAndSize(NULL, total);
    if (!bytes) {
        PyMem_Free(counts);
        return NULL;
    }
    char *buf = PyBytes_AS_STRING(bytes);
    memset(buf, 0, (size_t)total);
    Py_ssize_t pos = 0;
    for (Py_ssize_t j = 0; j < m && pos < total; j++) {
        int64_t run = counts[j];
        if (run < 0)
            run = 0;
        if (j & 1) {
            Py_ssize_t end = pos + (Py_ssize_t)run;
            if (end > total)
                end = total;
            memset(buf + pos, 1, (size_t)(end - pos));
        }
        pos += (Py_ssize_t)run;
    }
    PyMem_Free(counts);
    return bytes;
}

static PyMethodDef RleMethods[] = {
    {"decode_counts", py_decode_counts, METH_VARARGS,
     "decode_counts(s) -> list[int]: COCO compressed RLE counts."},
    {"decode_mask", py_decode_mask, METH_VARARGS,
     "decode_mask(counts, h, w) -> bytes: column-major uint8 mask buffer."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef rlemodule = {
    PyModuleDef_HEAD_INIT, "_rle_native",
    "COCO mask-RLE codec (native).", -1, RleMethods,
};

PyMODINIT_FUNC
PyInit__rle_native(void)
{
    return PyModule_Create(&rlemodule);
}
