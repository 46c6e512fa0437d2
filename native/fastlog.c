/* _fastlog: native buffered CSV row writer.
 *
 * TPU-native rebuild of the reference's C++ logging layer
 * (src/logging/csv.hpp:23-177 — a variadic typed row writer over
 * std::fstream). The Python fallback (logging/csv_logger.CSVWriter)
 * formats every float with repr() in the 200 Hz sim loop; this extension
 * does the same shortest-round-trip formatting (PyOS_double_to_string with
 * the 'r' code, so files are byte-identical to the fallback) but in C with
 * a 1 MiB stdio buffer, keeping host logging off the control path.
 *
 * API (mirrors the subset CSVWriter needs):
 *   w = _fastlog.Writer(path, header_line)
 *   w.write_row(doubles_sequence)   # one CSV row
 *   w.flush(); w.close()
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define FASTLOG_BUFFER_SIZE (1 << 20)

typedef struct {
    PyObject_HEAD
    FILE *file;
    char *buffer;
} WriterObject;

static int
writer_init(WriterObject *self, PyObject *args, PyObject *kwargs)
{
    const char *path;
    const char *header;
    static char *keyword_list[] = {"path", "header", NULL};
    if (!PyArg_ParseTupleAndKeywords(
            args, kwargs, "ss", keyword_list, &path, &header))
        return -1;

    self->file = fopen(path, "w");
    if (!self->file) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        return -1;
    }
    self->buffer = (char *)malloc(FASTLOG_BUFFER_SIZE);
    if (self->buffer)
        setvbuf(self->file, self->buffer, _IOFBF, FASTLOG_BUFFER_SIZE);
    if (header[0] != '\0') {
        fputs(header, self->file);
        fputc('\n', self->file);
    }
    return 0;
}

static void
writer_close_impl(WriterObject *self)
{
    if (self->file) {
        fclose(self->file);
        self->file = NULL;
    }
    if (self->buffer) {
        free(self->buffer);
        self->buffer = NULL;
    }
}

static void
writer_dealloc(WriterObject *self)
{
    writer_close_impl(self);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyObject *
writer_write_row(WriterObject *self, PyObject *arg)
{
    if (!self->file) {
        PyErr_SetString(PyExc_ValueError, "writer is closed");
        return NULL;
    }

    PyObject *sequence = PySequence_Fast(arg, "write_row expects a sequence");
    if (!sequence)
        return NULL;
    Py_ssize_t count = PySequence_Fast_GET_SIZE(sequence);
    PyObject **items = PySequence_Fast_ITEMS(sequence);

    for (Py_ssize_t i = 0; i < count; ++i) {
        if (i)
            fputc(',', self->file);
        PyObject *item = items[i];
        if (PyFloat_Check(item)) {
            /* Shortest round-trip repr — byte-identical to the Python
             * fallback's repr(float). */
            char *text = PyOS_double_to_string(
                PyFloat_AS_DOUBLE(item), 'r', 0, Py_DTSF_ADD_DOT_0, NULL);
            if (!text) {
                Py_DECREF(sequence);
                return NULL;
            }
            fputs(text, self->file);
            PyMem_Free(text);
        } else if (PyLong_Check(item)) {
            long long value = PyLong_AsLongLong(item);
            if (value == -1 && PyErr_Occurred()) {
                Py_DECREF(sequence);
                return NULL;
            }
            fprintf(self->file, "%lld", value);
        } else {
            PyObject *text = PyObject_Str(item);
            if (!text) {
                Py_DECREF(sequence);
                return NULL;
            }
            const char *utf8 = PyUnicode_AsUTF8(text);
            if (!utf8) {
                Py_DECREF(text);
                Py_DECREF(sequence);
                return NULL;
            }
            fputs(utf8, self->file);
            Py_DECREF(text);
        }
    }
    fputc('\n', self->file);
    Py_DECREF(sequence);
    Py_RETURN_NONE;
}

static PyObject *
writer_flush(WriterObject *self, PyObject *Py_UNUSED(ignored))
{
    if (self->file)
        fflush(self->file);
    Py_RETURN_NONE;
}

static PyObject *
writer_close(WriterObject *self, PyObject *Py_UNUSED(ignored))
{
    writer_close_impl(self);
    Py_RETURN_NONE;
}

static PyMethodDef writer_methods[] = {
    {"write_row", (PyCFunction)writer_write_row, METH_O,
     "Write one CSV row from a sequence of values."},
    {"flush", (PyCFunction)writer_flush, METH_NOARGS, "Flush buffers."},
    {"close", (PyCFunction)writer_close, METH_NOARGS, "Close the file."},
    {NULL, NULL, 0, NULL},
};

static PyTypeObject WriterType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "_fastlog.Writer",
    .tp_basicsize = sizeof(WriterObject),
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_doc = "Native buffered CSV row writer.",
    .tp_new = PyType_GenericNew,
    .tp_init = (initproc)writer_init,
    .tp_dealloc = (destructor)writer_dealloc,
    .tp_methods = writer_methods,
};

static PyModuleDef fastlog_module = {
    PyModuleDef_HEAD_INIT,
    .m_name = "_fastlog",
    .m_doc = "Native buffered CSV logging.",
    .m_size = -1,
};

PyMODINIT_FUNC
PyInit__fastlog(void)
{
    if (PyType_Ready(&WriterType) < 0)
        return NULL;
    PyObject *module = PyModule_Create(&fastlog_module);
    if (!module)
        return NULL;
    Py_INCREF(&WriterType);
    if (PyModule_AddObject(module, "Writer", (PyObject *)&WriterType) < 0) {
        Py_DECREF(&WriterType);
        Py_DECREF(module);
        return NULL;
    }
    return module;
}
