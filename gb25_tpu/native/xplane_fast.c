/* Fast XSpace/XPlane protobuf scanner (CPython extension).
 *
 * Reference capability: the GB-25 analysis layer decodes XLA profiler
 * XSpace protobufs offline (analysis/xspace/tensorflow/profiler/xplane_pb.jl)
 * to mine kernel statistics from multi-gigabyte traces. The pure-Python
 * wire-format walker in gb25_tpu/analysis/xplane.py is the portable path;
 * this extension does the same single pass in C at memory speed.
 *
 * Exposes: aggregate(bytes) ->
 *   list of (plane_name, {event_name: total_duration_ps}) per XPlane.
 *
 * Schema (tensorflow/profiler/protobuf/xplane.proto):
 *   XSpace{planes=1} / XPlane{name=2, lines=3, event_metadata=4}
 *   XLine{events=4} / XEvent{metadata_id=1, duration_ps=3}
 *   map entry{key=1, value=2} / XEventMetadata{id=1, name=2}
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

typedef struct {
    const uint8_t *p;
    const uint8_t *end;
} buf_t;

static int read_varint(buf_t *b, uint64_t *out) {
    uint64_t result = 0;
    int shift = 0;
    while (b->p < b->end) {
        uint8_t byte = *b->p++;
        result |= (uint64_t)(byte & 0x7F) << shift;
        if (!(byte & 0x80)) { *out = result; return 0; }
        shift += 7;
        if (shift >= 64) return -1;
    }
    return -1;
}

/* read one field; returns field number, sets *sub for length-delimited */
static int next_field(buf_t *b, uint64_t *field, uint64_t *varint,
                      buf_t *sub) {
    uint64_t tag;
    if (b->p >= b->end) return 0; /* done */
    if (read_varint(b, &tag) < 0) return -1;
    *field = tag >> 3;
    switch (tag & 7) {
    case 0: /* varint */
        if (read_varint(b, varint) < 0) return -1;
        sub->p = sub->end = NULL;
        return 1;
    case 1: /* 64-bit */
        if (b->end - b->p < 8) return -1;
        memcpy(varint, b->p, 8);
        b->p += 8;
        sub->p = sub->end = NULL;
        return 1;
    case 2: { /* length-delimited */
        uint64_t len;
        if (read_varint(b, &len) < 0) return -1;
        if ((uint64_t)(b->end - b->p) < len) return -1;
        sub->p = b->p;
        sub->end = b->p + len;
        b->p += len;
        *varint = 0;
        return 2;
    }
    case 5: /* 32-bit */
        if (b->end - b->p < 4) return -1;
        *varint = 0;
        b->p += 4;
        sub->p = sub->end = NULL;
        return 1;
    default:
        return -1;
    }
}

/* XEvent: sum duration_ps per metadata_id into a python dict (id->ps) */
static int parse_event(buf_t b, PyObject *durs) {
    uint64_t field, v, mid = 0, dur = 0;
    buf_t sub;
    int r;
    while ((r = next_field(&b, &field, &v, &sub)) > 0) {
        if (field == 1 && r == 1) mid = v;
        else if (field == 3 && r == 1) dur = v;
    }
    if (r < 0) return -1;
    PyObject *key = PyLong_FromUnsignedLongLong(mid);
    if (!key) return -1;
    PyObject *old = PyDict_GetItem(durs, key); /* borrowed */
    unsigned long long total = dur + (old ? PyLong_AsUnsignedLongLong(old) : 0);
    PyObject *val = PyLong_FromUnsignedLongLong(total);
    int rc = val ? PyDict_SetItem(durs, key, val) : -1;
    Py_XDECREF(val);
    Py_DECREF(key);
    return rc;
}

static int parse_line(buf_t b, PyObject *durs) {
    uint64_t field, v;
    buf_t sub;
    int r;
    while ((r = next_field(&b, &field, &v, &sub)) > 0) {
        if (field == 4 && r == 2) {
            if (parse_event(sub, durs) < 0) return -1;
        }
    }
    return r;
}

/* map<int64, XEventMetadata> entry -> set names[id] = name */
static int parse_meta_entry(buf_t b, PyObject *names) {
    uint64_t field, v, key = 0;
    buf_t sub, meta = {NULL, NULL};
    int r;
    while ((r = next_field(&b, &field, &v, &sub)) > 0) {
        if (field == 1 && r == 1) key = v;
        else if (field == 2 && r == 2) meta = sub;
    }
    if (r < 0) return -1;
    const char *name = NULL;
    Py_ssize_t name_len = 0;
    if (meta.p) {
        buf_t mb = meta;
        while ((r = next_field(&mb, &field, &v, &sub)) > 0) {
            if (field == 1 && r == 1 && !key) key = v;
            else if (field == 2 && r == 2) {
                name = (const char *)sub.p;
                name_len = sub.end - sub.p;
            }
        }
        if (r < 0) return -1;
    }
    if (!name) return 0;
    PyObject *k = PyLong_FromUnsignedLongLong(key);
    PyObject *s = PyUnicode_DecodeUTF8(name, name_len, "replace");
    int rc = (k && s) ? PyDict_SetItem(names, k, s) : -1;
    Py_XDECREF(k);
    Py_XDECREF(s);
    return rc;
}

static PyObject *parse_plane(buf_t b) {
    uint64_t field, v;
    buf_t sub;
    int r;
    PyObject *name = NULL, *durs = PyDict_New(), *names = PyDict_New();
    if (!durs || !names) goto fail;
    while ((r = next_field(&b, &field, &v, &sub)) > 0) {
        if (field == 2 && r == 2) {
            Py_XDECREF(name);
            name = PyUnicode_DecodeUTF8((const char *)sub.p, sub.end - sub.p, "replace");
            if (!name) goto fail;
        } else if (field == 3 && r == 2) {
            if (parse_line(sub, durs) < 0) goto fail;
        } else if (field == 4 && r == 2) {
            if (parse_meta_entry(sub, names) < 0) goto fail;
        }
    }
    if (r < 0) goto fail;

    /* resolve ids to names */
    PyObject *out = PyDict_New();
    if (!out) goto fail;
    PyObject *key, *val;
    Py_ssize_t pos = 0;
    while (PyDict_Next(durs, &pos, &key, &val)) {
        PyObject *nm = PyDict_GetItem(names, key); /* borrowed */
        if (nm) {
            if (PyDict_SetItem(out, nm, val) < 0) { Py_DECREF(out); goto fail; }
        } else {
            PyObject *ks = PyObject_Str(key);
            int rc = ks ? PyDict_SetItem(out, ks, val) : -1;
            Py_XDECREF(ks);
            if (rc < 0) { Py_DECREF(out); goto fail; }
        }
    }
    Py_DECREF(durs);
    Py_DECREF(names);
    PyObject *tup = PyTuple_Pack(2, name ? name : PyUnicode_FromString(""), out);
    Py_XDECREF(name);
    Py_DECREF(out);
    return tup;
fail:
    Py_XDECREF(name);
    Py_XDECREF(durs);
    Py_XDECREF(names);
    return NULL;
}

static PyObject *aggregate(PyObject *self, PyObject *args) {
    Py_buffer view;
    if (!PyArg_ParseTuple(args, "y*", &view)) return NULL;
    buf_t b = {(const uint8_t *)view.buf, (const uint8_t *)view.buf + view.len};
    PyObject *planes = PyList_New(0);
    if (!planes) { PyBuffer_Release(&view); return NULL; }
    uint64_t field, v;
    buf_t sub;
    int r;
    while ((r = next_field(&b, &field, &v, &sub)) > 0) {
        if (field == 1 && r == 2) {
            PyObject *plane = parse_plane(sub);
            if (!plane || PyList_Append(planes, plane) < 0) {
                Py_XDECREF(plane);
                Py_DECREF(planes);
                PyBuffer_Release(&view);
                return NULL;
            }
            Py_DECREF(plane);
        }
    }
    PyBuffer_Release(&view);
    if (r < 0) {
        Py_DECREF(planes);
        PyErr_SetString(PyExc_ValueError, "malformed XSpace protobuf");
        return NULL;
    }
    return planes;
}

static PyMethodDef methods[] = {
    {"aggregate", aggregate, METH_VARARGS,
     "aggregate(data: bytes) -> [(plane_name, {event_name: duration_ps})]"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "xplane_fast", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit_xplane_fast(void) { return PyModule_Create(&moduledef); }
