// _shardops: native host-side kernels for the KG shard compiler.
//
// TPU-native replacement for the host half of PyG's C++ sampler stack
// (reference environment.yml:8-11): destination counting-sort (stable,
// O(E+N)), CSR offset construction, and edge coalescing over multi-million
// edge relations. CPython C API + numpy, no pybind11 (not in image).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

// Stable counting sort of (src, dst) by dst. O(E + N), single allocation.
static PyObject* sort_edges_by_dst(PyObject*, PyObject* args) {
  PyArrayObject *src_arr, *dst_arr;
  if (!PyArg_ParseTuple(args, "O!O!", &PyArray_Type, &src_arr, &PyArray_Type,
                        &dst_arr))
    return nullptr;
  if (PyArray_TYPE(src_arr) != NPY_INT64 || PyArray_TYPE(dst_arr) != NPY_INT64 ||
      PyArray_NDIM(src_arr) != 1 || PyArray_NDIM(dst_arr) != 1) {
    PyErr_SetString(PyExc_TypeError, "expected 1-D int64 arrays");
    return nullptr;
  }
  npy_intp e = PyArray_DIM(src_arr, 0);
  if (PyArray_DIM(dst_arr, 0) != e) {
    PyErr_SetString(PyExc_ValueError, "src/dst length mismatch");
    return nullptr;
  }
  const int64_t* src = static_cast<const int64_t*>(PyArray_DATA(src_arr));
  const int64_t* dst = static_cast<const int64_t*>(PyArray_DATA(dst_arr));

  int64_t max_dst = -1;
  for (npy_intp i = 0; i < e; ++i) {
    if (dst[i] < 0) {
      PyErr_SetString(PyExc_ValueError, "negative dst index");
      return nullptr;
    }
    max_dst = std::max(max_dst, dst[i]);
  }

  npy_intp dims[1] = {e};
  PyObject* out_src = PyArray_SimpleNew(1, dims, NPY_INT64);
  PyObject* out_dst = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!out_src || !out_dst) {
    Py_XDECREF(out_src);
    Py_XDECREF(out_dst);
    return nullptr;
  }
  int64_t* osrc =
      static_cast<int64_t*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out_src)));
  int64_t* odst =
      static_cast<int64_t*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out_dst)));

  {
    std::vector<int64_t> counts(static_cast<size_t>(max_dst + 2), 0);
    Py_BEGIN_ALLOW_THREADS;
    for (npy_intp i = 0; i < e; ++i) counts[static_cast<size_t>(dst[i]) + 1]++;
    for (size_t i = 1; i < counts.size(); ++i) counts[i] += counts[i - 1];
    for (npy_intp i = 0; i < e; ++i) {
      int64_t pos = counts[static_cast<size_t>(dst[i])]++;
      osrc[pos] = src[i];
      odst[pos] = dst[i];
    }
    Py_END_ALLOW_THREADS;
  }
  return Py_BuildValue("(NN)", out_src, out_dst);
}

static PyObject* build_csr_offsets(PyObject*, PyObject* args) {
  PyArrayObject* dst_arr;
  long long num_rows;
  if (!PyArg_ParseTuple(args, "O!L", &PyArray_Type, &dst_arr, &num_rows))
    return nullptr;
  if (PyArray_TYPE(dst_arr) != NPY_INT64 || PyArray_NDIM(dst_arr) != 1) {
    PyErr_SetString(PyExc_TypeError, "expected 1-D int64 array");
    return nullptr;
  }
  npy_intp e = PyArray_DIM(dst_arr, 0);
  const int64_t* dst = static_cast<const int64_t*>(PyArray_DATA(dst_arr));

  npy_intp dims[1] = {static_cast<npy_intp>(num_rows + 1)};
  PyObject* out = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!out) return nullptr;
  int64_t* off =
      static_cast<int64_t*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out)));

  bool bad = false;
  Py_BEGIN_ALLOW_THREADS;
  std::fill(off, off + num_rows + 1, 0);
  for (npy_intp i = 0; i < e; ++i) {
    if (dst[i] < 0 || dst[i] >= num_rows) {
      bad = true;
      break;
    }
    off[dst[i] + 1]++;
  }
  if (!bad)
    for (long long i = 1; i <= num_rows; ++i) off[i] += off[i - 1];
  Py_END_ALLOW_THREADS;
  if (bad) {
    Py_DECREF(out);
    PyErr_SetString(PyExc_ValueError, "dst index out of [0, num_rows)");
    return nullptr;
  }
  return out;
}

static PyObject* coalesce_edges(PyObject*, PyObject* args) {
  PyArrayObject *src_arr, *dst_arr;
  long long num_dst;
  if (!PyArg_ParseTuple(args, "O!O!L", &PyArray_Type, &src_arr, &PyArray_Type,
                        &dst_arr, &num_dst))
    return nullptr;
  if (PyArray_TYPE(src_arr) != NPY_INT64 || PyArray_TYPE(dst_arr) != NPY_INT64) {
    PyErr_SetString(PyExc_TypeError, "expected int64 arrays");
    return nullptr;
  }
  npy_intp e = PyArray_DIM(src_arr, 0);
  const int64_t* src = static_cast<const int64_t*>(PyArray_DATA(src_arr));
  const int64_t* dst = static_cast<const int64_t*>(PyArray_DATA(dst_arr));

  std::vector<std::pair<int64_t, int64_t>> pairs;
  Py_BEGIN_ALLOW_THREADS;
  pairs.reserve(static_cast<size_t>(e));
  for (npy_intp i = 0; i < e; ++i) pairs.emplace_back(src[i], dst[i]);
  std::sort(pairs.begin(), pairs.end());
  pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
  Py_END_ALLOW_THREADS;

  npy_intp dims[1] = {static_cast<npy_intp>(pairs.size())};
  PyObject* out_src = PyArray_SimpleNew(1, dims, NPY_INT64);
  PyObject* out_dst = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!out_src || !out_dst) {
    Py_XDECREF(out_src);
    Py_XDECREF(out_dst);
    return nullptr;
  }
  int64_t* osrc =
      static_cast<int64_t*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out_src)));
  int64_t* odst =
      static_cast<int64_t*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out_dst)));
  for (size_t i = 0; i < pairs.size(); ++i) {
    osrc[i] = pairs[i].first;
    odst[i] = pairs[i].second;
  }
  return Py_BuildValue("(NN)", out_src, out_dst);
}

static PyMethodDef Methods[] = {
    {"sort_edges_by_dst", sort_edges_by_dst, METH_VARARGS,
     "Stable counting-sort of (src, dst) by dst."},
    {"build_csr_offsets", build_csr_offsets, METH_VARARGS,
     "CSR row offsets from an ascending dst array."},
    {"coalesce_edges", coalesce_edges, METH_VARARGS,
     "Sort by (src, dst) and drop duplicate edges."},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_shardops",
                                       "native shard compiler kernels", -1,
                                       Methods};

}  // namespace

PyMODINIT_FUNC PyInit__shardops(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
