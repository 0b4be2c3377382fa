// smallk_tpu native host-side accelerators.
//
// The reference implements its entire IO and preprocessing stack in C++
// (common/src/matrix_market_file.cpp, common/src/delimited_file.cpp,
// preprocessor/src/preprocess.cpp with SpookyHash column dedup).  This
// extension provides the same native speed for the Python framework's
// host-side hot paths:
//   - parse_mtx_body:   MatrixMarket coordinate body -> COO arrays
//   - format_mtx_body:  COO arrays -> MatrixMarket body text
//   - unique_cols_mask: duplicate-column detection on CSC buffers
//     (reference UniqueCols semantics: max-index survivor per group)
//
// Built with setuptools (native/setup.py); smallk_tpu falls back to pure
// Python when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// --------------------------------------------------------------------------
// parse_mtx_body(data: bytes, nnz: int, has_values: bool)
//   -> (rows int64[nnz], cols int64[nnz], vals float64[nnz])
// Entries are 1-based in the file; returned 0-based.
// --------------------------------------------------------------------------
PyObject* parse_mtx_body(PyObject*, PyObject* args) {
  Py_buffer buf;
  Py_ssize_t nnz;
  int has_values;
  if (!PyArg_ParseTuple(args, "y*np", &buf, &nnz, &has_values)) {
    return nullptr;
  }

  npy_intp dims[1] = {static_cast<npy_intp>(nnz)};
  PyObject* rows_arr = PyArray_SimpleNew(1, dims, NPY_INT64);
  PyObject* cols_arr = PyArray_SimpleNew(1, dims, NPY_INT64);
  PyObject* vals_arr = PyArray_SimpleNew(1, dims, NPY_FLOAT64);
  if (!rows_arr || !cols_arr || !vals_arr) {
    Py_XDECREF(rows_arr);
    Py_XDECREF(cols_arr);
    Py_XDECREF(vals_arr);
    PyBuffer_Release(&buf);
    return nullptr;
  }
  int64_t* rows =
      static_cast<int64_t*>(PyArray_DATA((PyArrayObject*)rows_arr));
  int64_t* cols =
      static_cast<int64_t*>(PyArray_DATA((PyArrayObject*)cols_arr));
  double* vals =
      static_cast<double*>(PyArray_DATA((PyArrayObject*)vals_arr));

  const char* p = static_cast<const char*>(buf.buf);
  const char* end = p + buf.len;
  Py_ssize_t count = 0;
  bool error = false;

  Py_BEGIN_ALLOW_THREADS
  while (count < nnz && p < end) {
    // skip whitespace/newlines
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
    if (p >= end) break;
    if (*p == '%') {  // comment line
      while (p < end && *p != '\n') ++p;
      continue;
    }
    char* next = nullptr;
    long long r = strtoll(p, &next, 10);
    if (next == p) { error = true; break; }
    p = next;
    long long c = strtoll(p, &next, 10);
    if (next == p) { error = true; break; }
    p = next;
    double v = 1.0;
    if (has_values) {
      v = strtod(p, &next);
      if (next == p) { error = true; break; }
      p = next;
    }
    rows[count] = r - 1;
    cols[count] = c - 1;
    vals[count] = v;
    ++count;
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&buf);
  if (error || count != nnz) {
    Py_DECREF(rows_arr);
    Py_DECREF(cols_arr);
    Py_DECREF(vals_arr);
    PyErr_Format(PyExc_ValueError,
                 "mtx body parse error: expected %zd entries, parsed %zd",
                 nnz, count);
    return nullptr;
  }
  return Py_BuildValue("(NNN)", rows_arr, cols_arr, vals_arr);
}

// --------------------------------------------------------------------------
// format_mtx_body(rows int64[], cols int64[], vals float64[], precision)
//   -> bytes   ("r c v\n" per entry, 1-based, %.{p}g)
// --------------------------------------------------------------------------
PyObject* format_mtx_body(PyObject*, PyObject* args) {
  PyObject *rows_o, *cols_o, *vals_o;
  int precision;
  if (!PyArg_ParseTuple(args, "OOOi", &rows_o, &cols_o, &vals_o,
                        &precision)) {
    return nullptr;
  }
  PyArrayObject* rows = (PyArrayObject*)PyArray_FROM_OTF(
      rows_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* cols = (PyArrayObject*)PyArray_FROM_OTF(
      cols_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* vals = (PyArrayObject*)PyArray_FROM_OTF(
      vals_o, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  if (!rows || !cols || !vals) {
    Py_XDECREF(rows);
    Py_XDECREF(cols);
    Py_XDECREF(vals);
    return nullptr;
  }
  npy_intp n = PyArray_DIM(rows, 0);
  const int64_t* r = static_cast<const int64_t*>(PyArray_DATA(rows));
  const int64_t* c = static_cast<const int64_t*>(PyArray_DATA(cols));
  const double* v = static_cast<const double*>(PyArray_DATA(vals));

  std::string out;
  Py_BEGIN_ALLOW_THREADS
  out.reserve(static_cast<size_t>(n) * 24);
  char line[96];
  char fmt[24];
  snprintf(fmt, sizeof(fmt), "%%lld %%lld %%.%dg\n", precision);
  for (npy_intp i = 0; i < n; ++i) {
    int len = snprintf(line, sizeof(line), fmt,
                       static_cast<long long>(r[i] + 1),
                       static_cast<long long>(c[i] + 1), v[i]);
    out.append(line, len);
  }
  Py_END_ALLOW_THREADS

  PyObject* result = PyBytes_FromStringAndSize(out.data(), out.size());
  Py_DECREF(rows);
  Py_DECREF(cols);
  Py_DECREF(vals);
  return result;
}

// FNV-1a 64-bit over a byte range (reference used SpookyHash-64; any
// well-mixed 64-bit hash works — collisions are resolved exactly below).
static inline uint64_t fnv1a(const unsigned char* data, size_t len,
                             uint64_t h = 1469598103934665603ull) {
  for (size_t i = 0; i < len; ++i) {
    h ^= data[i];
    h *= 1099511628211ull;
  }
  return h;
}

// --------------------------------------------------------------------------
// unique_cols_mask(indptr int64[n+1], indices int32[nnz], data float64[nnz])
//   -> bool[n]  (True = column survives dedup; max-index survivor)
// --------------------------------------------------------------------------
PyObject* unique_cols_mask(PyObject*, PyObject* args) {
  PyObject *indptr_o, *indices_o, *data_o;
  if (!PyArg_ParseTuple(args, "OOO", &indptr_o, &indices_o, &data_o)) {
    return nullptr;
  }
  PyArrayObject* indptr = (PyArrayObject*)PyArray_FROM_OTF(
      indptr_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* indices = (PyArrayObject*)PyArray_FROM_OTF(
      indices_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* data = (PyArrayObject*)PyArray_FROM_OTF(
      data_o, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  if (!indptr || !indices || !data) {
    Py_XDECREF(indptr);
    Py_XDECREF(indices);
    Py_XDECREF(data);
    return nullptr;
  }
  npy_intp n = PyArray_DIM(indptr, 0) - 1;
  const int64_t* ip = static_cast<const int64_t*>(PyArray_DATA(indptr));
  const int64_t* ix = static_cast<const int64_t*>(PyArray_DATA(indices));
  const double* dv = static_cast<const double*>(PyArray_DATA(data));

  npy_intp dims[1] = {n};
  PyObject* mask_arr = PyArray_SimpleNew(1, dims, NPY_BOOL);
  if (!mask_arr) {
    Py_DECREF(indptr);
    Py_DECREF(indices);
    Py_DECREF(data);
    return nullptr;
  }
  npy_bool* mask =
      static_cast<npy_bool*>(PyArray_DATA((PyArrayObject*)mask_arr));

  Py_BEGIN_ALLOW_THREADS
  // hash -> representative column (max index seen); exact comparison on
  // hash match to resolve collisions, as in the reference
  // (preprocess.cpp:631-724)
  std::unordered_map<uint64_t, std::vector<int64_t>> groups;
  groups.reserve(static_cast<size_t>(n) * 2);
  std::vector<int64_t> survivor(n);
  for (npy_intp j = 0; j < n; ++j) {
    int64_t lo = ip[j], hi = ip[j + 1];
    uint64_t h = fnv1a(
        reinterpret_cast<const unsigned char*>(ix + lo),
        static_cast<size_t>(hi - lo) * sizeof(int64_t));
    h = fnv1a(reinterpret_cast<const unsigned char*>(dv + lo),
              static_cast<size_t>(hi - lo) * sizeof(double), h);
    h ^= static_cast<uint64_t>(hi - lo) * 0x9e3779b97f4a7c15ull;
    groups[h].push_back(j);
  }
  for (npy_intp j = 0; j < n; ++j) mask[j] = NPY_TRUE;
  for (auto& kv : groups) {
    auto& cols = kv.second;
    if (cols.size() < 2) continue;
    // exact-compare within the bucket; later identical col wins
    for (size_t a = 0; a < cols.size(); ++a) {
      if (!mask[cols[a]]) continue;
      for (size_t b = a + 1; b < cols.size(); ++b) {
        if (!mask[cols[b]]) continue;
        int64_t ja = cols[a], jb = cols[b];
        int64_t la = ip[ja + 1] - ip[ja], lb = ip[jb + 1] - ip[jb];
        if (la != lb) continue;
        if (memcmp(ix + ip[ja], ix + ip[jb], la * sizeof(int64_t)) != 0)
          continue;
        if (memcmp(dv + ip[ja], dv + ip[jb], la * sizeof(double)) != 0)
          continue;
        // identical: keep the larger index (jb > ja since insertion order)
        mask[ja] = NPY_FALSE;
        break;
      }
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(indptr);
  Py_DECREF(indices);
  Py_DECREF(data);
  return mask_arr;
}

// --------------------------------------------------------------------------
// preprocess_prune(indptr int64[n+1], indices int64[nnz], data float64[nnz],
//                  docs_per_term, terms_per_doc, max_iter)
//   -> (indptr', indices', data', term_keep bool[m], doc_keep bool[n])
// The reference prune/dedupe loop (preprocess.cpp:117-151) in one native
// pass: rows pruned when occurrence-count < docs_per_term or doc-frequency
// == width; columns pruned when nnz < terms_per_doc; duplicate columns
// keep the max original index; loop to fixpoint.  Row/col indices in the
// returned CSC are renumbered compactly; keep masks map back to originals.
// --------------------------------------------------------------------------
PyObject* preprocess_prune(PyObject*, PyObject* args) {
  PyObject *indptr_o, *indices_o, *data_o;
  long long docs_per_term, terms_per_doc, max_iter, height;
  if (!PyArg_ParseTuple(args, "OOOLLLL", &indptr_o, &indices_o, &data_o,
                        &height, &docs_per_term, &terms_per_doc,
                        &max_iter)) {
    return nullptr;
  }
  PyArrayObject* indptr = (PyArrayObject*)PyArray_FROM_OTF(
      indptr_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* indices = (PyArrayObject*)PyArray_FROM_OTF(
      indices_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* data = (PyArrayObject*)PyArray_FROM_OTF(
      data_o, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  if (!indptr || !indices || !data) {
    Py_XDECREF(indptr);
    Py_XDECREF(indices);
    Py_XDECREF(data);
    return nullptr;
  }
  const int64_t m = height;
  const int64_t n0 = PyArray_DIM(indptr, 0) - 1;
  const int64_t* ip0 = static_cast<const int64_t*>(PyArray_DATA(indptr));
  const int64_t* ix0 = static_cast<const int64_t*>(PyArray_DATA(indices));
  const double* dv0 = static_cast<const double*>(PyArray_DATA(data));

  bool all_pruned = false;
  std::vector<int64_t> ip(ip0, ip0 + n0 + 1);
  std::vector<int64_t> ix(ix0, ix0 + ip0[n0]);
  std::vector<double> dv(dv0, dv0 + ip0[n0]);
  // current col j corresponds to original column col_orig[j]; rows keep
  // original ids until the end (masks are by original id)
  std::vector<int64_t> col_orig(n0);
  std::vector<unsigned char> row_alive(m, 1), col_alive_orig(n0, 1);
  for (int64_t j = 0; j < n0; ++j) col_orig[j] = j;

  Py_BEGIN_ALLOW_THREADS
  std::vector<double> occ(m);
  std::vector<int64_t> df(m);
  std::vector<unsigned char> row_keep(m);
  for (long long it = 0; it < max_iter; ++it) {
    int64_t n = static_cast<int64_t>(col_orig.size());
    // --- row stats + prune (in place compaction of the CSC arrays) ---
    std::fill(occ.begin(), occ.end(), 0.0);
    std::fill(df.begin(), df.end(), 0);
    for (size_t t = 0; t < ix.size(); ++t) {
      occ[ix[t]] += dv[t];
      df[ix[t]] += 1;
    }
    bool rows_changed = false;
    for (int64_t r = 0; r < m; ++r) {
      bool keep = row_alive[r] && occ[r] >= docs_per_term && df[r] < n;
      row_keep[r] = keep ? 1 : 0;
      if (row_alive[r] && !keep) rows_changed = true;
    }
    if (rows_changed) {
      for (int64_t r = 0; r < m; ++r) row_alive[r] = row_keep[r];
      size_t w = 0;
      for (int64_t j = 0; j < n; ++j) {
        int64_t lo = ip[j], hi = ip[j + 1];
        ip[j] = static_cast<int64_t>(w);
        for (int64_t t = lo; t < hi; ++t) {
          if (row_alive[ix[t]]) {
            ix[w] = ix[t];
            dv[w] = dv[t];
            ++w;
          }
        }
      }
      ip[n] = static_cast<int64_t>(w);
      ix.resize(w);
      dv.resize(w);
    }

    // --- column prune (nnz < terms_per_doc) ---
    bool cols_changed = false;
    {
      size_t w = 0;
      int64_t jw = 0;
      std::vector<int64_t> new_ip(n + 1);
      std::vector<int64_t> new_orig;
      new_orig.reserve(n);
      for (int64_t j = 0; j < n; ++j) {
        int64_t lo = ip[j], hi = ip[j + 1];
        if (hi - lo >= terms_per_doc) {
          new_ip[jw] = static_cast<int64_t>(w);
          for (int64_t t = lo; t < hi; ++t) {
            ix[w] = ix[t];
            dv[w] = dv[t];
            ++w;
          }
          new_orig.push_back(col_orig[j]);
          ++jw;
        } else {
          cols_changed = true;
        }
      }
      new_ip[jw] = static_cast<int64_t>(w);
      new_ip.resize(jw + 1);
      ip = std::move(new_ip);
      ix.resize(w);
      dv.resize(w);
      col_orig = std::move(new_orig);
    }
    if (col_orig.empty()) { all_pruned = true; break; }

    // --- duplicate columns: keep max original index per group ---
    int64_t n2 = static_cast<int64_t>(col_orig.size());
    std::unordered_map<uint64_t, std::vector<int64_t>> groups;
    groups.reserve(static_cast<size_t>(n2) * 2);
    for (int64_t j = 0; j < n2; ++j) {
      int64_t lo = ip[j], hi = ip[j + 1];
      uint64_t h = fnv1a(
          reinterpret_cast<const unsigned char*>(ix.data() + lo),
          static_cast<size_t>(hi - lo) * sizeof(int64_t));
      h = fnv1a(reinterpret_cast<const unsigned char*>(dv.data() + lo),
                static_cast<size_t>(hi - lo) * sizeof(double), h);
      h ^= static_cast<uint64_t>(hi - lo) * 0x9e3779b97f4a7c15ull;
      groups[h].push_back(j);
    }
    std::vector<unsigned char> keep_col(n2, 1);
    bool dedup_changed = false;
    for (auto& kv : groups) {
      auto& cols = kv.second;
      if (cols.size() < 2) continue;
      for (size_t a = 0; a < cols.size(); ++a) {
        if (!keep_col[cols[a]]) continue;
        for (size_t b = a + 1; b < cols.size(); ++b) {
          if (!keep_col[cols[b]]) continue;
          int64_t ja = cols[a], jb = cols[b];
          int64_t la = ip[ja + 1] - ip[ja], lb = ip[jb + 1] - ip[jb];
          if (la != lb) continue;
          if (memcmp(ix.data() + ip[ja], ix.data() + ip[jb],
                     la * sizeof(int64_t)) != 0)
            continue;
          if (memcmp(dv.data() + ip[ja], dv.data() + ip[jb],
                     la * sizeof(double)) != 0)
            continue;
          keep_col[ja] = 0;  // later (higher-original-index) col survives
          dedup_changed = true;
          break;
        }
      }
    }
    if (dedup_changed) {
      size_t w = 0;
      int64_t jw = 0;
      std::vector<int64_t> new_ip(n2 + 1);
      std::vector<int64_t> new_orig;
      new_orig.reserve(n2);
      for (int64_t j = 0; j < n2; ++j) {
        if (!keep_col[j]) continue;
        int64_t lo = ip[j], hi = ip[j + 1];
        new_ip[jw] = static_cast<int64_t>(w);
        for (int64_t t = lo; t < hi; ++t) {
          ix[w] = ix[t];
          dv[w] = dv[t];
          ++w;
        }
        new_orig.push_back(col_orig[j]);
        ++jw;
      }
      new_ip[jw] = static_cast<int64_t>(w);
      new_ip.resize(jw + 1);
      ip = std::move(new_ip);
      ix.resize(w);
      dv.resize(w);
      col_orig = std::move(new_orig);
    }

    if (!cols_changed && !dedup_changed) break;
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(indptr);
  Py_DECREF(indices);
  Py_DECREF(data);
  if (all_pruned) {
    PyErr_SetString(PyExc_ValueError,
                    "Preprocessor: all columns were pruned.");
    return nullptr;
  }

  const int64_t n_out = static_cast<int64_t>(col_orig.size());
  npy_intp d_ip[1] = {n_out + 1};
  npy_intp d_nz[1] = {static_cast<npy_intp>(ix.size())};
  npy_intp d_m[1] = {m};
  npy_intp d_n[1] = {n0};
  PyObject* ip_arr = PyArray_SimpleNew(1, d_ip, NPY_INT64);
  PyObject* ix_arr = PyArray_SimpleNew(1, d_nz, NPY_INT64);
  PyObject* dv_arr = PyArray_SimpleNew(1, d_nz, NPY_FLOAT64);
  PyObject* rk_arr = PyArray_SimpleNew(1, d_m, NPY_BOOL);
  PyObject* ck_arr = PyArray_SimpleNew(1, d_n, NPY_BOOL);
  if (!ip_arr || !ix_arr || !dv_arr || !rk_arr || !ck_arr) {
    Py_XDECREF(ip_arr); Py_XDECREF(ix_arr); Py_XDECREF(dv_arr);
    Py_XDECREF(rk_arr); Py_XDECREF(ck_arr);
    return nullptr;
  }
  memcpy(PyArray_DATA((PyArrayObject*)ip_arr), ip.data(),
         (n_out + 1) * sizeof(int64_t));
  memcpy(PyArray_DATA((PyArrayObject*)ix_arr), ix.data(),
         ix.size() * sizeof(int64_t));
  memcpy(PyArray_DATA((PyArrayObject*)dv_arr), dv.data(),
         dv.size() * sizeof(double));
  npy_bool* rk = static_cast<npy_bool*>(
      PyArray_DATA((PyArrayObject*)rk_arr));
  for (int64_t r = 0; r < m; ++r) rk[r] = row_alive[r] ? NPY_TRUE
                                                       : NPY_FALSE;
  npy_bool* ck = static_cast<npy_bool*>(
      PyArray_DATA((PyArrayObject*)ck_arr));
  memset(ck, 0, n0 * sizeof(npy_bool));
  for (int64_t j = 0; j < n_out; ++j) ck[col_orig[j]] = NPY_TRUE;

  return Py_BuildValue("(NNNNN)", ip_arr, ix_arr, dv_arr, rk_arr, ck_arr);
}

// --------------------------------------------------------------------------
// preprocess_full(indptr, indices, data float64[nnz], height,
//                 docs_per_term, terms_per_doc, max_iter, boolean_mode)
//   -> (indptr' i32[n'+1], indices' i32[nnz'], tf f64[nnz'],
//       scores f64[nnz'], term_keep bool[m], doc_keep bool[n])
//
// The WHOLE reference preprocessor pipeline (preprocess.cpp:81-253) in one
// native call: round-to-int counts (boolean mode: presence), the
// prune/dedupe fixpoint loop, then tf-idf scoring with unit-L2 columns.
// Single int32 index space, fused row+column prune compaction (one pass),
// dedup hashing computed during that same pass.  Returned `indices` are
// renumbered compactly; keep masks map back to original ids.
// --------------------------------------------------------------------------
PyObject* preprocess_full(PyObject*, PyObject* args) {
  PyObject *indptr_o, *indices_o, *data_o;
  long long height, docs_per_term, terms_per_doc, max_iter;
  int boolean_mode;
  if (!PyArg_ParseTuple(args, "OOOLLLLp", &indptr_o, &indices_o, &data_o,
                        &height, &docs_per_term, &terms_per_doc, &max_iter,
                        &boolean_mode)) {
    return nullptr;
  }
  PyArrayObject* indptr = (PyArrayObject*)PyArray_FROM_OTF(
      indptr_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* indices = (PyArrayObject*)PyArray_FROM_OTF(
      indices_o, NPY_INT32, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* data = (PyArrayObject*)PyArray_FROM_OTF(
      data_o, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  if (!indptr || !indices || !data) {
    Py_XDECREF(indptr);
    Py_XDECREF(indices);
    Py_XDECREF(data);
    return nullptr;
  }
  const int32_t m = static_cast<int32_t>(height);
  const int64_t n0 = PyArray_DIM(indptr, 0) - 1;
  const int64_t* ip64 = static_cast<const int64_t*>(PyArray_DATA(indptr));
  const int32_t* ix0 = static_cast<const int32_t*>(PyArray_DATA(indices));
  const double* dv0 = static_cast<const double*>(PyArray_DATA(data));
  const int64_t nnz0 = ip64[n0];

  bool all_pruned = false;
  std::vector<int32_t> ip(n0 + 1), ix, col_orig(n0);
  std::vector<double> dv;
  std::vector<unsigned char> row_alive(m, 1);
  int64_t n = n0;  // surviving column count (shrinks in the loop below)
  // per-iteration (height, width, nnz) after prune+dedupe — the
  // caller prints these with the reference's per-iteration cadence
  // (preprocess.cpp:172)
  std::vector<int64_t> iter_stats;

  Py_BEGIN_ALLOW_THREADS
  ix.reserve(nnz0);
  dv.reserve(nnz0);
  // ingest: round counts (or booleanize), drop zeros
  {
    size_t w = 0;
    ix.resize(nnz0);
    dv.resize(nnz0);
    for (int64_t j = 0; j < n0; ++j) {
      ip[j] = static_cast<int32_t>(w);
      for (int64_t t = ip64[j]; t < ip64[j + 1]; ++t) {
        // boolean mode: every STORED entry counts as presence (the
        // reference booleanizes structural nonzeros,
        // term_frequency_matrix.cpp)
        double v = boolean_mode ? 1.0 : std::nearbyint(dv0[t]);
        if (v != 0.0) {
          ix[w] = ix0[t];
          dv[w] = v;
          ++w;
        }
      }
      col_orig[j] = static_cast<int32_t>(j);
    }
    ip[n0] = static_cast<int32_t>(w);
    ix.resize(w);
    dv.resize(w);
  }

  std::vector<double> occ(m);
  std::vector<int32_t> df(m);
  std::vector<uint64_t> hashes;
  std::unordered_map<uint64_t, std::vector<int32_t>> groups;
  for (long long it = 0; it < max_iter; ++it) {
    // --- row stats ---
    std::fill(occ.begin(), occ.end(), 0.0);
    std::fill(df.begin(), df.end(), 0);
    const size_t nz = ix.size();
    for (size_t t = 0; t < nz; ++t) {
      occ[ix[t]] += dv[t];
      df[ix[t]] += 1;
    }
    bool rows_changed = false;
    for (int32_t r = 0; r < m; ++r) {
      if (!row_alive[r]) continue;
      if (occ[r] < docs_per_term || df[r] >= n) {
        row_alive[r] = 0;
        rows_changed = true;
      }
    }

    // --- fused row-filter + column-prune compaction, hashing on the fly
    bool cols_changed = false;
    hashes.clear();
    hashes.reserve(n);
    {
      size_t w = 0;
      int64_t jw = 0;
      for (int64_t j = 0; j < n; ++j) {
        int32_t lo = ip[j], hi = ip[j + 1];
        size_t start = w;
        if (rows_changed) {
          for (int32_t t = lo; t < hi; ++t) {
            if (row_alive[ix[t]]) {
              ix[w] = ix[t];
              dv[w] = dv[t];
              ++w;
            }
          }
        } else {
          if (w != static_cast<size_t>(lo)) {
            memmove(ix.data() + w, ix.data() + lo,
                    (hi - lo) * sizeof(int32_t));
            memmove(dv.data() + w, dv.data() + lo,
                    (hi - lo) * sizeof(double));
          }
          w += hi - lo;
        }
        int64_t len = static_cast<int64_t>(w - start);
        if (len < terms_per_doc) {
          w = start;  // drop this column
          cols_changed = true;
          continue;
        }
        uint64_t h = fnv1a(
            reinterpret_cast<const unsigned char*>(ix.data() + start),
            static_cast<size_t>(len) * sizeof(int32_t));
        h = fnv1a(reinterpret_cast<const unsigned char*>(dv.data() + start),
                  static_cast<size_t>(len) * sizeof(double), h);
        h ^= static_cast<uint64_t>(len) * 0x9e3779b97f4a7c15ull;
        hashes.push_back(h);
        ip[jw] = static_cast<int32_t>(start);
        col_orig[jw] = col_orig[j];
        ++jw;
      }
      ip[jw] = static_cast<int32_t>(w);
      n = jw;
      ix.resize(w);
      dv.resize(w);
    }
    if (n == 0) { all_pruned = true; break; }

    // --- duplicate columns: keep max original index per group ---
    groups.clear();
    groups.reserve(static_cast<size_t>(n) * 2);
    for (int64_t j = 0; j < n; ++j)
      groups[hashes[j]].push_back(static_cast<int32_t>(j));
    std::vector<unsigned char> keep_col(n, 1);
    bool dedup_changed = false;
    for (auto& kv : groups) {
      auto& cols = kv.second;
      if (cols.size() < 2) continue;
      for (size_t a = 0; a < cols.size(); ++a) {
        if (!keep_col[cols[a]]) continue;
        for (size_t b = a + 1; b < cols.size(); ++b) {
          if (!keep_col[cols[b]]) continue;
          int32_t ja = cols[a], jb = cols[b];
          int32_t la = ip[ja + 1] - ip[ja], lb = ip[jb + 1] - ip[jb];
          if (la != lb) continue;
          if (memcmp(ix.data() + ip[ja], ix.data() + ip[jb],
                     la * sizeof(int32_t)) != 0)
            continue;
          if (memcmp(dv.data() + ip[ja], dv.data() + ip[jb],
                     la * sizeof(double)) != 0)
            continue;
          keep_col[ja] = 0;  // later (higher original index) col survives
          dedup_changed = true;
          break;
        }
      }
    }
    if (dedup_changed) {
      size_t w = 0;
      int64_t jw = 0;
      for (int64_t j = 0; j < n; ++j) {
        if (!keep_col[j]) continue;
        int32_t lo = ip[j], hi = ip[j + 1];
        if (w != static_cast<size_t>(lo)) {
          memmove(ix.data() + w, ix.data() + lo, (hi - lo) * sizeof(int32_t));
          memmove(dv.data() + w, dv.data() + lo, (hi - lo) * sizeof(double));
        }
        ip[jw] = static_cast<int32_t>(w);
        col_orig[jw] = col_orig[j];
        w += hi - lo;
        ++jw;
      }
      ip[jw] = static_cast<int32_t>(w);
      n = jw;
      ix.resize(w);
      dv.resize(w);
    }

    int64_t alive = 0;
    for (int32_t r = 0; r < m; ++r) alive += row_alive[r];
    iter_stats.push_back(alive);
    iter_stats.push_back(n);
    iter_stats.push_back(static_cast<int64_t>(ix.size()));
    if (!cols_changed && !dedup_changed) break;
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(indptr);
  Py_DECREF(indices);
  Py_DECREF(data);
  if (all_pruned) {
    PyErr_SetString(PyExc_ValueError,
                    "Preprocessor: all columns were pruned.");
    return nullptr;
  }

  // --- compact row renumbering + tf-idf scores + unit-L2 columns ---
  std::vector<int32_t> new_row(m);
  int32_t mh = 0;
  for (int32_t r = 0; r < m; ++r) new_row[r] = row_alive[r] ? mh++ : -1;

  npy_intp d_ip[1] = {n + 1};
  npy_intp d_nz[1] = {static_cast<npy_intp>(ix.size())};
  npy_intp d_m[1] = {m};
  npy_intp d_n[1] = {n0};
  PyObject* ip_arr = PyArray_SimpleNew(1, d_ip, NPY_INT32);
  PyObject* ix_arr = PyArray_SimpleNew(1, d_nz, NPY_INT32);
  PyObject* tf_arr = PyArray_SimpleNew(1, d_nz, NPY_FLOAT64);
  PyObject* sc_arr = PyArray_SimpleNew(1, d_nz, NPY_FLOAT64);
  PyObject* rk_arr = PyArray_SimpleNew(1, d_m, NPY_BOOL);
  PyObject* ck_arr = PyArray_SimpleNew(1, d_n, NPY_BOOL);
  if (!ip_arr || !ix_arr || !tf_arr || !sc_arr || !rk_arr || !ck_arr) {
    Py_XDECREF(ip_arr); Py_XDECREF(ix_arr); Py_XDECREF(tf_arr);
    Py_XDECREF(sc_arr); Py_XDECREF(rk_arr); Py_XDECREF(ck_arr);
    return nullptr;
  }
  int32_t* ip_out = static_cast<int32_t*>(PyArray_DATA((PyArrayObject*)ip_arr));
  int32_t* ix_out = static_cast<int32_t*>(PyArray_DATA((PyArrayObject*)ix_arr));
  double* tf_out = static_cast<double*>(PyArray_DATA((PyArrayObject*)tf_arr));
  double* sc_out = static_cast<double*>(PyArray_DATA((PyArrayObject*)sc_arr));
  npy_bool* rk = static_cast<npy_bool*>(PyArray_DATA((PyArrayObject*)rk_arr));
  npy_bool* ck = static_cast<npy_bool*>(PyArray_DATA((PyArrayObject*)ck_arr));

  Py_BEGIN_ALLOW_THREADS
  memcpy(ip_out, ip.data(), (n + 1) * sizeof(int32_t));
  // final per-row document frequency (over the surviving matrix)
  std::vector<int32_t> dff(mh, 0);
  const size_t nz = ix.size();
  for (size_t t = 0; t < nz; ++t) {
    ix_out[t] = new_row[ix[t]];
    dff[ix_out[t]] += 1;
  }
  std::vector<double> idf(mh);
  const double logw = std::log(static_cast<double>(n));
  for (int32_t r = 0; r < mh; ++r)
    idf[r] = logw - std::log(static_cast<double>(dff[r]));
  for (int64_t j = 0; j < n; ++j) {
    double ss = 0.0;
    for (int32_t t = ip[j]; t < ip[j + 1]; ++t) {
      double s = (1.0 + std::log(dv[t])) * idf[ix_out[t]];
      sc_out[t] = s;
      tf_out[t] = dv[t];
      ss += s * s;
    }
    if (ss > 0.0) {
      double inv = 1.0 / std::sqrt(ss);
      for (int32_t t = ip[j]; t < ip[j + 1]; ++t) sc_out[t] *= inv;
    }
  }
  for (int32_t r = 0; r < m; ++r) rk[r] = row_alive[r] ? NPY_TRUE : NPY_FALSE;
  memset(ck, 0, n0 * sizeof(npy_bool));
  for (int64_t j = 0; j < n; ++j) ck[col_orig[j]] = NPY_TRUE;
  Py_END_ALLOW_THREADS

  npy_intp d_st[2] = {static_cast<npy_intp>(iter_stats.size() / 3), 3};
  PyObject* st_arr = PyArray_SimpleNew(2, d_st, NPY_INT64);
  if (!st_arr) {
    Py_DECREF(ip_arr); Py_DECREF(ix_arr); Py_DECREF(tf_arr);
    Py_DECREF(sc_arr); Py_DECREF(rk_arr); Py_DECREF(ck_arr);
    return nullptr;
  }
  memcpy(PyArray_DATA((PyArrayObject*)st_arr), iter_stats.data(),
         iter_stats.size() * sizeof(int64_t));
  return Py_BuildValue("(NNNNNNN)", ip_arr, ix_arr, tf_arr, sc_arr, rk_arr,
                       ck_arr, st_arr);
}

PyMethodDef methods[] = {
    {"preprocess_full", preprocess_full, METH_VARARGS,
     "Full reference preprocessor pipeline (prune/dedupe/tf-idf) on CSC "
     "buffers."},
    {"preprocess_prune", preprocess_prune, METH_VARARGS,
     "Reference prune/dedupe loop on CSC buffers; returns pruned CSC + "
     "row/col keep masks."},
    {"parse_mtx_body", parse_mtx_body, METH_VARARGS,
     "Parse MatrixMarket coordinate body text into COO arrays."},
    {"format_mtx_body", format_mtx_body, METH_VARARGS,
     "Format COO arrays as MatrixMarket coordinate body text."},
    {"unique_cols_mask", unique_cols_mask, METH_VARARGS,
     "Duplicate-column survivor mask for a CSC matrix."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native",
    "smallk_tpu native host-side accelerators", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
