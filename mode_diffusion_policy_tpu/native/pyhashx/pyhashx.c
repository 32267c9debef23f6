/* _pyhashx — non-cryptographic hash functions for dataset windowing and
 * evaluation determinism.
 *
 * Native (C, CPython C API) replacement for the reference's pybind11 pyhash
 * extension (/root/reference/pyhash-0.9.3/src/Hash.cpp:17-105). Call
 * semantics match the reference exactly:
 *
 *   h = fnv1_32()            # default seed 0 (Hash.h:123)
 *   h("text")                # unicode hashed as UTF-16LE w/o BOM (Hash.h:241-291)
 *   h(b"bytes")              # bytes hashed raw
 *   h(a, b, c)               # multi-arg: value chains as the running seed
 *   h(x, seed=123)           # explicit seed overrides the instance seed
 *
 * All algorithms are implemented from their public specifications:
 * FNV-1/FNV-1a (Fowler–Noll–Vo), MurmurHash3 (Appleby, public domain),
 * xxHash32/64 (Collet, BSD), SuperFastHash (Hsieh), lookup3 (Jenkins,
 * public domain).  The seed parameter is the initial hash state (for FNV it
 * is the offset basis, so seed=0 reproduces pyhash's default outputs and
 * seed=0x811c9dc5 reproduces the canonical FNV-1 vectors).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stddef.h>
#include <stdint.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* Algorithms                                                          */
/* ------------------------------------------------------------------ */

static uint32_t fnv1_32(const uint8_t *p, size_t n, uint32_t h) {
    for (size_t i = 0; i < n; i++) { h *= 16777619u; h ^= p[i]; }
    return h;
}
static uint32_t fnv1a_32(const uint8_t *p, size_t n, uint32_t h) {
    for (size_t i = 0; i < n; i++) { h ^= p[i]; h *= 16777619u; }
    return h;
}
static uint64_t fnv1_64(const uint8_t *p, size_t n, uint64_t h) {
    for (size_t i = 0; i < n; i++) { h *= 1099511628211ULL; h ^= p[i]; }
    return h;
}
static uint64_t fnv1a_64(const uint8_t *p, size_t n, uint64_t h) {
    for (size_t i = 0; i < n; i++) { h ^= p[i]; h *= 1099511628211ULL; }
    return h;
}

static inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }
static inline uint64_t rotl64(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

static uint32_t murmur3_32(const uint8_t *data, size_t len, uint32_t seed) {
    const uint32_t c1 = 0xcc9e2d51u, c2 = 0x1b873593u;
    uint32_t h = seed;
    size_t nblocks = len / 4;
    for (size_t i = 0; i < nblocks; i++) {
        uint32_t k;
        memcpy(&k, data + i * 4, 4);
        k *= c1; k = rotl32(k, 15); k *= c2;
        h ^= k; h = rotl32(h, 13); h = h * 5 + 0xe6546b64u;
    }
    const uint8_t *tail = data + nblocks * 4;
    uint32_t k1 = 0;
    switch (len & 3) {
        case 3: k1 ^= (uint32_t)tail[2] << 16; /* fallthrough */
        case 2: k1 ^= (uint32_t)tail[1] << 8;  /* fallthrough */
        case 1: k1 ^= tail[0];
                k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2; h ^= k1;
    }
    h ^= (uint32_t)len;
    h ^= h >> 16; h *= 0x85ebca6bu; h ^= h >> 13; h *= 0xc2b2ae35u; h ^= h >> 16;
    return h;
}

#define XXP32_1 2654435761U
#define XXP32_2 2246822519U
#define XXP32_3 3266489917U
#define XXP32_4 668265263U
#define XXP32_5 374761393U

static uint32_t xx_32(const uint8_t *p, size_t len, uint32_t seed) {
    const uint8_t *end = p + len;
    uint32_t h;
    if (len >= 16) {
        const uint8_t *limit = end - 16;
        uint32_t v1 = seed + XXP32_1 + XXP32_2, v2 = seed + XXP32_2,
                 v3 = seed, v4 = seed - XXP32_1;
        do {
            uint32_t k;
            memcpy(&k, p, 4); v1 += k * XXP32_2; v1 = rotl32(v1, 13); v1 *= XXP32_1; p += 4;
            memcpy(&k, p, 4); v2 += k * XXP32_2; v2 = rotl32(v2, 13); v2 *= XXP32_1; p += 4;
            memcpy(&k, p, 4); v3 += k * XXP32_2; v3 = rotl32(v3, 13); v3 *= XXP32_1; p += 4;
            memcpy(&k, p, 4); v4 += k * XXP32_2; v4 = rotl32(v4, 13); v4 *= XXP32_1; p += 4;
        } while (p <= limit);
        h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
    } else {
        h = seed + XXP32_5;
    }
    h += (uint32_t)len;
    while (p + 4 <= end) {
        uint32_t k; memcpy(&k, p, 4);
        h += k * XXP32_3; h = rotl32(h, 17) * XXP32_4; p += 4;
    }
    while (p < end) { h += (*p) * XXP32_5; h = rotl32(h, 11) * XXP32_1; p++; }
    h ^= h >> 15; h *= XXP32_2; h ^= h >> 13; h *= XXP32_3; h ^= h >> 16;
    return h;
}

#define XXP64_1 11400714785074694791ULL
#define XXP64_2 14029467366897019727ULL
#define XXP64_3 1609587929392839161ULL
#define XXP64_4 9650029242287828579ULL
#define XXP64_5 2870177450012600261ULL

static uint64_t xx_round(uint64_t acc, uint64_t input) {
    acc += input * XXP64_2; acc = rotl64(acc, 31); acc *= XXP64_1; return acc;
}
static uint64_t xx_merge(uint64_t acc, uint64_t val) {
    val = xx_round(0, val); acc ^= val; acc = acc * XXP64_1 + XXP64_4; return acc;
}

static uint64_t xx_64(const uint8_t *p, size_t len, uint64_t seed) {
    const uint8_t *end = p + len;
    uint64_t h;
    if (len >= 32) {
        const uint8_t *limit = end - 32;
        uint64_t v1 = seed + XXP64_1 + XXP64_2, v2 = seed + XXP64_2,
                 v3 = seed, v4 = seed - XXP64_1;
        do {
            uint64_t k;
            memcpy(&k, p, 8); v1 = xx_round(v1, k); p += 8;
            memcpy(&k, p, 8); v2 = xx_round(v2, k); p += 8;
            memcpy(&k, p, 8); v3 = xx_round(v3, k); p += 8;
            memcpy(&k, p, 8); v4 = xx_round(v4, k); p += 8;
        } while (p <= limit);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        h = xx_merge(h, v1); h = xx_merge(h, v2);
        h = xx_merge(h, v3); h = xx_merge(h, v4);
    } else {
        h = seed + XXP64_5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        uint64_t k; memcpy(&k, p, 8);
        h ^= xx_round(0, k); h = rotl64(h, 27) * XXP64_1 + XXP64_4; p += 8;
    }
    if (p + 4 <= end) {
        uint32_t k; memcpy(&k, p, 4);
        h ^= (uint64_t)k * XXP64_1; h = rotl64(h, 23) * XXP64_2 + XXP64_3; p += 4;
    }
    while (p < end) { h ^= (*p) * XXP64_5; h = rotl64(h, 11) * XXP64_1; p++; }
    h ^= h >> 33; h *= XXP64_2; h ^= h >> 29; h *= XXP64_3; h ^= h >> 32;
    return h;
}

static uint32_t super_fast_hash(const uint8_t *data, size_t len, uint32_t seed) {
    uint32_t hash = seed ? seed : (uint32_t)len, tmp;
    if (len == 0 || data == NULL) return 0;
    size_t rem = len & 3;
    len >>= 2;
    for (; len > 0; len--) {
        uint16_t lo, hi;
        memcpy(&lo, data, 2); memcpy(&hi, data + 2, 2);
        hash += lo;
        tmp = ((uint32_t)hi << 11) ^ hash;
        hash = (hash << 16) ^ tmp;
        data += 4;
        hash += hash >> 11;
    }
    switch (rem) {
        case 3: { uint16_t lo; memcpy(&lo, data, 2);
                  hash += lo; hash ^= hash << 16;
                  hash ^= (uint32_t)((int8_t)data[2]) << 18;
                  hash += hash >> 11; break; }
        case 2: { uint16_t lo; memcpy(&lo, data, 2);
                  hash += lo; hash ^= hash << 11; hash += hash >> 17; break; }
        case 1: hash += (int8_t)data[0]; hash ^= hash << 10; hash += hash >> 1;
    }
    hash ^= hash << 3; hash += hash >> 5; hash ^= hash << 4;
    hash += hash >> 17; hash ^= hash << 25; hash += hash >> 6;
    return hash;
}

/* lookup3 (Jenkins) hashlittle */
#define L3_MIX(a,b,c) { \
    a -= c; a ^= rotl32(c, 4);  c += b; \
    b -= a; b ^= rotl32(a, 6);  a += c; \
    c -= b; c ^= rotl32(b, 8);  b += a; \
    a -= c; a ^= rotl32(c,16);  c += b; \
    b -= a; b ^= rotl32(a,19);  a += c; \
    c -= b; c ^= rotl32(b, 4);  b += a; }
#define L3_FINAL(a,b,c) { \
    c ^= b; c -= rotl32(b,14); \
    a ^= c; a -= rotl32(c,11); \
    b ^= a; b -= rotl32(a,25); \
    c ^= b; c -= rotl32(b,16); \
    a ^= c; a -= rotl32(c, 4); \
    b ^= a; b -= rotl32(a,14); \
    c ^= b; c -= rotl32(b,24); }

static uint32_t lookup3_little(const uint8_t *k, size_t length, uint32_t initval) {
    uint32_t a, b, c;
    a = b = c = 0xdeadbeef + ((uint32_t)length) + initval;
    while (length > 12) {
        uint32_t w[3];
        memcpy(w, k, 12);
        a += w[0]; b += w[1]; c += w[2];
        L3_MIX(a, b, c);
        length -= 12; k += 12;
    }
    /* tail — byte-at-a-time little-endian accumulation */
    switch (length) {
        case 12: c += ((uint32_t)k[11]) << 24; /* fallthrough */
        case 11: c += ((uint32_t)k[10]) << 16; /* fallthrough */
        case 10: c += ((uint32_t)k[9]) << 8;   /* fallthrough */
        case 9:  c += k[8];                    /* fallthrough */
        case 8:  b += ((uint32_t)k[7]) << 24;  /* fallthrough */
        case 7:  b += ((uint32_t)k[6]) << 16;  /* fallthrough */
        case 6:  b += ((uint32_t)k[5]) << 8;   /* fallthrough */
        case 5:  b += k[4];                    /* fallthrough */
        case 4:  a += ((uint32_t)k[3]) << 24;  /* fallthrough */
        case 3:  a += ((uint32_t)k[2]) << 16;  /* fallthrough */
        case 2:  a += ((uint32_t)k[1]) << 8;   /* fallthrough */
        case 1:  a += k[0]; break;
        case 0:  return c;
    }
    L3_FINAL(a, b, c);
    return c;
}

/* MurmurHash2 (Appleby) */
static uint32_t murmur2_32(const uint8_t *data, size_t len, uint32_t seed) {
    const uint32_t m = 0x5bd1e995u; const int r = 24;
    uint32_t h = seed ^ (uint32_t)len;
    while (len >= 4) {
        uint32_t k; memcpy(&k, data, 4);
        k *= m; k ^= k >> r; k *= m;
        h *= m; h ^= k;
        data += 4; len -= 4;
    }
    switch (len) {
        case 3: h ^= (uint32_t)data[2] << 16; /* fallthrough */
        case 2: h ^= (uint32_t)data[1] << 8;  /* fallthrough */
        case 1: h ^= data[0]; h *= m;
    }
    h ^= h >> 13; h *= m; h ^= h >> 15;
    return h;
}

/* MurmurHash2 x64 (murmur2_x64_64a) */
static uint64_t murmur2_x64_64a(const uint8_t *data, size_t len, uint64_t seed) {
    const uint64_t m = 0xc6a4a7935bd1e995ULL; const int r = 47;
    uint64_t h = seed ^ (len * m);
    while (len >= 8) {
        uint64_t k; memcpy(&k, data, 8);
        k *= m; k ^= k >> r; k *= m;
        h ^= k; h *= m;
        data += 8; len -= 8;
    }
    switch (len) {
        case 7: h ^= (uint64_t)data[6] << 48; /* fallthrough */
        case 6: h ^= (uint64_t)data[5] << 40; /* fallthrough */
        case 5: h ^= (uint64_t)data[4] << 32; /* fallthrough */
        case 4: h ^= (uint64_t)data[3] << 24; /* fallthrough */
        case 3: h ^= (uint64_t)data[2] << 16; /* fallthrough */
        case 2: h ^= (uint64_t)data[1] << 8;  /* fallthrough */
        case 1: h ^= (uint64_t)data[0]; h *= m;
    }
    h ^= h >> r; h *= m; h ^= h >> r;
    return h;
}

/* ------------------------------------------------------------------ */
/* Hasher object                                                       */
/* ------------------------------------------------------------------ */

enum algo {
    ALG_FNV1_32, ALG_FNV1A_32, ALG_FNV1_64, ALG_FNV1A_64,
    ALG_MURMUR2_32, ALG_MURMUR2_X64_64A, ALG_MURMUR3_32,
    ALG_XX_32, ALG_XX_64, ALG_SUPER_FAST, ALG_LOOKUP3_LITTLE,
};

typedef struct {
    PyObject_HEAD
    unsigned long long seed;
    int algo;
    int is64;
} HasherObject;

static uint64_t dispatch(int algo, const uint8_t *buf, size_t len, uint64_t h) {
    switch (algo) {
        case ALG_FNV1_32:        return fnv1_32(buf, len, (uint32_t)h);
        case ALG_FNV1A_32:       return fnv1a_32(buf, len, (uint32_t)h);
        case ALG_FNV1_64:        return fnv1_64(buf, len, h);
        case ALG_FNV1A_64:       return fnv1a_64(buf, len, h);
        case ALG_MURMUR2_32:     return murmur2_32(buf, len, (uint32_t)h);
        case ALG_MURMUR2_X64_64A:return murmur2_x64_64a(buf, len, h);
        case ALG_MURMUR3_32:     return murmur3_32(buf, len, (uint32_t)h);
        case ALG_XX_32:          return xx_32(buf, len, (uint32_t)h);
        case ALG_XX_64:          return xx_64(buf, len, h);
        case ALG_SUPER_FAST:     return super_fast_hash(buf, len, (uint32_t)h);
        case ALG_LOOKUP3_LITTLE: return lookup3_little(buf, len, (uint32_t)h);
    }
    return 0;
}

/* Extract the bytes to hash from a python object, matching the reference's
 * handle_data (Hash.h:219-316): bytes raw; unicode as UTF-16 without BOM;
 * otherwise buffer protocol. Returns a new reference holding the buffer, or
 * NULL on error; sets *buf/*len. */
static PyObject *get_data(PyObject *obj, const char **buf, Py_ssize_t *len,
                          Py_buffer *view, int *used_view) {
    *used_view = 0;
    if (PyBytes_CheckExact(obj)) {
        if (PyBytes_AsStringAndSize(obj, (char **)buf, len) < 0) return NULL;
        Py_INCREF(obj);
        return obj;
    }
    if (PyUnicode_CheckExact(obj)) {
        PyObject *utf16 = PyUnicode_AsUTF16String(obj);
        if (!utf16) return NULL;
        if (PyBytes_AsStringAndSize(utf16, (char **)buf, len) < 0) {
            Py_DECREF(utf16);
            return NULL;
        }
        *buf += 2;   /* skip BOM */
        *len -= 2;
        return utf16;
    }
    if (PyObject_CheckBuffer(obj)) {
        if (PyObject_GetBuffer(obj, view, PyBUF_SIMPLE) < 0) return NULL;
        *buf = (const char *)view->buf;
        *len = view->len;
        *used_view = 1;
        Py_INCREF(obj);
        return obj;
    }
    PyErr_Format(PyExc_TypeError, "cannot hash object of type %s",
                 Py_TYPE(obj)->tp_name);
    return NULL;
}

static PyObject *hasher_call(HasherObject *self, PyObject *args, PyObject *kwargs) {
    unsigned long long value = self->seed;
    if (kwargs) {
        PyObject *s = PyDict_GetItemString(kwargs, "seed");
        if (s) {
            value = PyLong_AsUnsignedLongLongMask(s);
            if (PyErr_Occurred()) return NULL;
        }
    }
    Py_ssize_t nargs = PyTuple_GET_SIZE(args);
    for (Py_ssize_t i = 0; i < nargs; i++) {
        PyObject *arg = PyTuple_GET_ITEM(args, i);
        const char *buf = NULL;
        Py_ssize_t len = 0;
        Py_buffer view;
        int used_view = 0;
        PyObject *holder = get_data(arg, &buf, &len, &view, &used_view);
        if (!holder) return NULL;
        value = dispatch(self->algo, (const uint8_t *)buf, (size_t)len, value);
        if (used_view) PyBuffer_Release(&view);
        Py_DECREF(holder);
    }
    if (self->is64)
        return PyLong_FromUnsignedLongLong(value);
    return PyLong_FromUnsignedLong((unsigned long)(uint32_t)value);
}

static int hasher_init(HasherObject *self, PyObject *args, PyObject *kwargs) {
    static char *kwlist[] = {"seed", NULL};
    unsigned long long seed = 0;
    if (!PyArg_ParseTupleAndKeywords(args, kwargs, "|K", kwlist, &seed))
        return -1;
    self->seed = seed;
    return 0;
}

static PyMemberDef hasher_members[] = {
    {"seed", Py_T_ULONGLONG, offsetof(HasherObject, seed), 0, "default seed"},
    {NULL}
};

static PyTypeObject HasherTypeTemplate = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_basicsize = sizeof(HasherObject),
    .tp_flags = Py_TPFLAGS_DEFAULT | Py_TPFLAGS_BASETYPE,
    .tp_new = PyType_GenericNew,
    .tp_init = (initproc)hasher_init,
    .tp_call = (ternaryfunc)hasher_call,
    .tp_members = hasher_members,
};

static struct PyModuleDef pyhashx_module = {
    PyModuleDef_HEAD_INIT, "_pyhashx",
    "Non-cryptographic hashes with pyhash-compatible call semantics", -1, NULL,
};

typedef struct { const char *name; int algo; int is64; } algo_spec;

static algo_spec SPECS[] = {
    {"fnv1_32", ALG_FNV1_32, 0},
    {"fnv1a_32", ALG_FNV1A_32, 0},
    {"fnv1_64", ALG_FNV1_64, 1},
    {"fnv1a_64", ALG_FNV1A_64, 1},
    {"murmur2_32", ALG_MURMUR2_32, 0},
    {"murmur2_x64_64a", ALG_MURMUR2_X64_64A, 1},
    {"murmur3_32", ALG_MURMUR3_32, 0},
    {"xx_32", ALG_XX_32, 0},
    {"xx_64", ALG_XX_64, 1},
    {"super_fast_hash", ALG_SUPER_FAST, 0},
    {"lookup3_little", ALG_LOOKUP3_LITTLE, 0},
    {NULL, 0, 0}
};

/* per-algorithm subclasses share tp_call but carry their algo id via a
 * class-level default set in tp_init wrapper below */
static PyTypeObject algo_types[sizeof(SPECS) / sizeof(SPECS[0])];

static int algo_init(HasherObject *self, PyObject *args, PyObject *kwargs) {
    if (hasher_init(self, args, kwargs) < 0) return -1;
    /* find which type this is */
    for (int i = 0; SPECS[i].name; i++) {
        if (Py_TYPE(self) == &algo_types[i]) {
            self->algo = SPECS[i].algo;
            self->is64 = SPECS[i].is64;
            return 0;
        }
    }
    PyErr_SetString(PyExc_TypeError, "unknown hasher type");
    return -1;
}

PyMODINIT_FUNC PyInit__pyhashx(void) {
    PyObject *m = PyModule_Create(&pyhashx_module);
    if (!m) return NULL;
    for (int i = 0; SPECS[i].name; i++) {
        PyTypeObject *t = &algo_types[i];
        memcpy(t, &HasherTypeTemplate, sizeof(PyTypeObject));
        char *full = malloc(strlen(SPECS[i].name) + 10);
        sprintf(full, "_pyhashx.%s", SPECS[i].name);
        t->tp_name = full;
        t->tp_init = (initproc)algo_init;
        if (PyType_Ready(t) < 0) return NULL;
        Py_INCREF(t);
        if (PyModule_AddObject(m, SPECS[i].name, (PyObject *)t) < 0) return NULL;
    }
    return m;
}
