/* _pqmf_wavio — native host-side audio data layer.
 *
 * The reference delegates its host I/O to torchaudio's C++ backends
 * (PQMFWrapper.py:113/134, VocoderPitchShifter.py:309-344) and its
 * real-time hosting to the TorchScript C++ interpreter. This extension is
 * the framework's native data-plane equivalent: sample-format conversion
 * and windowed overlap-add accumulation as tight C loops over Python
 * buffer-protocol objects (zero-copy on NumPy arrays), used by
 * pqmf_tpu.utils.audio and the block-streaming CLI with a pure-NumPy
 * fallback when the extension is not built.
 *
 * Build: python pqmf_tpu/native/setup.py build_ext --inplace
 *        (or pqmf_tpu.native.build()).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <stdint.h>
#include <string.h>

/* pcm16_to_f32(src: bytes-like) -> bytes (float32 little-endian) */
static PyObject *
pcm16_to_f32(PyObject *self, PyObject *args)
{
    Py_buffer src;
    if (!PyArg_ParseTuple(args, "y*", &src))
        return NULL;
    Py_ssize_t n = src.len / 2;
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * 4);
    if (!out) {
        PyBuffer_Release(&src);
        return NULL;
    }
    const int16_t *in = (const int16_t *)src.buf;
    float *dst = (float *)PyBytes_AS_STRING(out);
    const float scale = 1.0f / 32768.0f;
    for (Py_ssize_t i = 0; i < n; i++)
        dst[i] = (float)in[i] * scale;
    PyBuffer_Release(&src);
    return out;
}

/* f32_to_pcm16(src: bytes-like of float32) -> bytes (int16, clipped) */
static PyObject *
f32_to_pcm16(PyObject *self, PyObject *args)
{
    Py_buffer src;
    if (!PyArg_ParseTuple(args, "y*", &src))
        return NULL;
    Py_ssize_t n = src.len / 4;
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * 2);
    if (!out) {
        PyBuffer_Release(&src);
        return NULL;
    }
    const float *in = (const float *)src.buf;
    int16_t *dst = (int16_t *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < n; i++) {
        float v = in[i] * 32767.0f;
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        dst[i] = (int16_t)lrintf(v);
    }
    PyBuffer_Release(&src);
    return out;
}

/* pcm24_to_f32(src) -> bytes (float32) */
static PyObject *
pcm24_to_f32(PyObject *self, PyObject *args)
{
    Py_buffer src;
    if (!PyArg_ParseTuple(args, "y*", &src))
        return NULL;
    Py_ssize_t n = src.len / 3;
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * 4);
    if (!out) {
        PyBuffer_Release(&src);
        return NULL;
    }
    const uint8_t *in = (const uint8_t *)src.buf;
    float *dst = (float *)PyBytes_AS_STRING(out);
    const float scale = 1.0f / 8388608.0f;
    for (Py_ssize_t i = 0; i < n; i++) {
        int32_t v = (int32_t)in[3 * i] | ((int32_t)in[3 * i + 1] << 8)
                    | ((int32_t)in[3 * i + 2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        dst[i] = (float)v * scale;
    }
    PyBuffer_Release(&src);
    return out;
}

/* ola_accumulate(out: f32 writable, norm: f32 writable, block: f32,
 *                window: f32, offset: int)
 * out[offset+i] += block[i] * window[i]; norm[offset+i] += window[i]^2.
 * Clipped to the buffers' bounds. */
static PyObject *
ola_accumulate(PyObject *self, PyObject *args)
{
    Py_buffer out, norm, block, window;
    Py_ssize_t offset;
    if (!PyArg_ParseTuple(args, "w*w*y*y*n", &out, &norm, &block, &window,
                          &offset))
        return NULL;
    Py_ssize_t n_out = out.len / 4, n_norm = norm.len / 4;
    Py_ssize_t n_blk = block.len / 4, n_win = window.len / 4;
    Py_ssize_t n = n_blk < n_win ? n_blk : n_win;
    float *o = (float *)out.buf, *nm = (float *)norm.buf;
    const float *b = (const float *)block.buf;
    const float *w = (const float *)window.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t j = offset + i;
        if (j < 0 || j >= n_out || j >= n_norm)
            continue;
        o[j] += b[i] * w[i];
        nm[j] += w[i] * w[i];
    }
    PyBuffer_Release(&out);
    PyBuffer_Release(&norm);
    PyBuffer_Release(&block);
    PyBuffer_Release(&window);
    Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"pcm16_to_f32", pcm16_to_f32, METH_VARARGS,
     "Decode little-endian PCM16 bytes to float32 bytes in [-1, 1)."},
    {"f32_to_pcm16", f32_to_pcm16, METH_VARARGS,
     "Encode float32 bytes to clipped PCM16 bytes."},
    {"pcm24_to_f32", pcm24_to_f32, METH_VARARGS,
     "Decode packed little-endian PCM24 bytes to float32 bytes."},
    {"ola_accumulate", ola_accumulate, METH_VARARGS,
     "Windowed overlap-add into (out, norm) accumulators at offset."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_pqmf_wavio",
    "Native sample-format conversion + OLA accumulation.", -1, Methods,
};

PyMODINIT_FUNC
PyInit__pqmf_wavio(void)
{
    return PyModule_Create(&moduledef);
}
