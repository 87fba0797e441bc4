/* Native image-IO runtime: ASCII PPM (P3) encode/decode + gamma quantizer.
 *
 * TPU-native counterpart of the reference's C++ output path (src/rt.cpp:
 * 812-820 writes "P3\n<w> <h>\n255\n" and per-pixel "r g b " via fprintf;
 * mathUtilities.h:43-45 is the gamma-2.2 quantizer). The pure-Python writer
 * in vpt/io/ppm.py is the behavioral reference; this extension produces
 * byte-identical files at native speed (a 1024x768 frame is ~2.4M ints —
 * ~50x faster than str.join in Python).
 *
 * Built with vpt/io/build_native.py (setuptools, no external deps).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* write_p3(path: str, q: buffer of int32, h, w) -> None
 * q must be a C-contiguous (h*w*3,) int32 buffer of already-quantized
 * values in [0, 255]. */
static PyObject *write_p3(PyObject *self, PyObject *args) {
    const char *path;
    Py_buffer buf;
    int h, w;
    if (!PyArg_ParseTuple(args, "sy*ii", &path, &buf, &h, &w)) return NULL;
    if (buf.len != (Py_ssize_t)h * w * 3 * (Py_ssize_t)sizeof(int)) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer size != h*w*3 int32");
        return NULL;
    }
    const int *q = (const int *)buf.buf;
    /* worst case "255 " = 4 bytes per value + header */
    size_t cap = (size_t)h * w * 3 * 4 + 64;
    char *out = (char *)malloc(cap);
    if (!out) {
        PyBuffer_Release(&buf);
        return PyErr_NoMemory();
    }
    char *p = out;
    p += sprintf(p, "P3\n%d %d\n255\n", w, h);
    Py_ssize_t n = (Py_ssize_t)h * w * 3;
    for (Py_ssize_t i = 0; i < n; i++) {
        int v = q[i];
        if (v < 0) v = 0;
        if (v > 255) v = 255;
        /* fast int -> ascii for 0..255 */
        if (v >= 100) {
            *p++ = (char)('0' + v / 100);
            *p++ = (char)('0' + (v / 10) % 10);
            *p++ = (char)('0' + v % 10);
        } else if (v >= 10) {
            *p++ = (char)('0' + v / 10);
            *p++ = (char)('0' + v % 10);
        } else {
            *p++ = (char)('0' + v);
        }
        *p++ = ' ';
    }
    FILE *f = fopen(path, "wb");
    if (!f) {
        free(out);
        PyBuffer_Release(&buf);
        return PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    }
    size_t len = (size_t)(p - out);
    size_t written = fwrite(out, 1, len, f);
    fclose(f);
    free(out);
    PyBuffer_Release(&buf);
    if (written != len) {
        PyErr_SetString(PyExc_OSError, "short write");
        return NULL;
    }
    Py_RETURN_NONE;
}

/* tonemap(linear: buffer of float64, n) -> bytes of int32
 * clamp to [0,1], pow(1/2.2)*255+0.5 (mathUtilities.h:43-45). */
static PyObject *tonemap(PyObject *self, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
    Py_ssize_t n = buf.len / (Py_ssize_t)sizeof(double);
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * sizeof(int));
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    const double *x = (const double *)buf.buf;
    int *q = (int *)PyBytes_AS_STRING(out);
    const double inv_gamma = 1.0 / 2.2;
    for (Py_ssize_t i = 0; i < n; i++) {
        double v = x[i];
        if (v < 0.0) v = 0.0;
        if (v > 1.0) v = 1.0;
        q[i] = (int)(pow(v, inv_gamma) * 255.0 + 0.5);
    }
    PyBuffer_Release(&buf);
    return out;
}

/* read_p3(path) -> (bytes of int32, w, h) */
static PyObject *read_p3(PyObject *self, PyObject *args) {
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) return NULL;
    FILE *f = fopen(path, "rb");
    if (!f) return PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    char *data = (char *)malloc((size_t)sz + 1);
    if (!data) {
        fclose(f);
        return PyErr_NoMemory();
    }
    if (fread(data, 1, (size_t)sz, f) != (size_t)sz) {
        fclose(f);
        free(data);
        PyErr_SetString(PyExc_OSError, "short read");
        return NULL;
    }
    fclose(f);
    data[sz] = 0;
    char *p = data;
    if (strncmp(p, "P3", 2) != 0) {
        free(data);
        PyErr_SetString(PyExc_ValueError, "not a P3 ppm");
        return NULL;
    }
    p += 2;
    long w = strtol(p, &p, 10);
    long h = strtol(p, &p, 10);
    strtol(p, &p, 10); /* maxval */
    Py_ssize_t n = (Py_ssize_t)w * h * 3;
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * sizeof(int));
    if (!out) {
        free(data);
        return NULL;
    }
    int *q = (int *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < n; i++) {
        q[i] = (int)strtol(p, &p, 10);
    }
    free(data);
    return Py_BuildValue("(Nll)", out, w, h);
}

static PyMethodDef methods[] = {
    {"write_p3_raw", write_p3, METH_VARARGS,
     "write_p3_raw(path, int32_buffer, h, w): write reference-format P3"},
    {"tonemap_raw", tonemap, METH_VARARGS,
     "tonemap_raw(float64_buffer) -> int32 bytes (clamp + gamma 2.2)"},
    {"read_p3", read_p3, METH_VARARGS,
     "read_p3(path) -> (int32 bytes, w, h)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_ppmio",
    "Native PPM encode/decode + gamma quantizer", -1, methods,
};

PyMODINIT_FUNC PyInit__ppmio(void) { return PyModule_Create(&moduledef); }
