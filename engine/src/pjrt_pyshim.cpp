// Test PJRT plugin: a minimal PJRT C API implementation backed by an embedded
// CPython interpreter running jax's CPU runtime.
//
// Purpose: the engine's in-process PJRT backend (pjrt_backend.cpp) speaks the
// standard PJRT C ABI; on a production TPU host it dlopens libtpu.so. This
// development container reaches its TPU only through a Python-mediated tunnel,
// so no standalone hardware plugin exists to test against — this shim fills
// that hole: `GetPjrtApi()` returns the exact subset of the ABI the backend
// consumes (client create, MLIR compile, host<->device buffers, execute),
// implemented by calling jax's CPU client through the CPython C API. ctest can
// then exercise the full engine -> PJRT -> StableHLO executable path with no
// daemon and no Python process.
//
// This is a test double for libtpu, not a general PJRT implementation: only
// the entry points pjrt_backend.cpp uses are populated; everything else in
// the PJRT_Api table is null.
#include <Python.h>
#include <dlfcn.h>

#include <cstring>
#include <mutex>
#include <string>
#include <vector>

#include "pjrt_c_api.h"

namespace {

// ----------------------------------------------------------------- plumbing
struct ShimError {
    std::string message;
    PJRT_Error_Code code = PJRT_Error_Code_INTERNAL;
};

PJRT_Error* make_error(const std::string& msg,
                       PJRT_Error_Code code = PJRT_Error_Code_INTERNAL) {
    auto* e = new ShimError{msg, code};
    return reinterpret_cast<PJRT_Error*>(e);
}

ShimError* as_shim(const PJRT_Error* e) {
    return reinterpret_cast<ShimError*>(const_cast<PJRT_Error*>(e));
}

// Fetch the pending Python exception as a PJRT error.
PJRT_Error* python_error(const char* where) {
    std::string msg = std::string(where) + ": python error";
    if (PyErr_Occurred()) {
        PyObject *type, *value, *tb;
        PyErr_Fetch(&type, &value, &tb);
        if (value) {
            PyObject* s = PyObject_Str(value);
            if (s) {
                msg += ": ";
                msg += PyUnicode_AsUTF8(s);
                Py_DECREF(s);
            }
        }
        Py_XDECREF(type);
        Py_XDECREF(value);
        Py_XDECREF(tb);
    }
    return make_error(msg);
}

// The Python half: jax CPU client + an object registry keyed by int handles.
const char kPyHelper[] = R"PY(
import os
os.environ["JAX_PLATFORMS"] = "cpu"
# single-device test double: drop any inherited virtual-device-count flag
os.environ["XLA_FLAGS"] = " ".join(
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f)
try:
    import numpy as np
    import ml_dtypes
except Exception:
    import sys
    import traceback
    raise RuntimeError(
        f"exe={sys.executable!r} path={sys.path!r}\n{traceback.format_exc()}")

_DTYPES = {
    "f32": np.float32, "bf16": ml_dtypes.bfloat16, "f16": np.float16,
    "s8": np.int8, "s16": np.int16, "s32": np.int32, "s64": np.int64,
    "u8": np.uint8, "u16": np.uint16, "u32": np.uint32, "u64": np.uint64,
    "pred": np.bool_, "f64": np.float64,
}
_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}

_objs = {}
_next = [1]
_client = None


def _put(o):
    h = _next[0]
    _next[0] += 1
    _objs[h] = o
    return h


def create_client():
    global _client
    if _client is None:
        from jax._src import xla_bridge
        _client = xla_bridge.get_backend("cpu")
    return 0


def compile_mlir(code):
    from jaxlib import _jax
    exe = _client.compile_and_load(bytes(code), _client.local_devices(),
                                   _jax.CompileOptions())
    return _put(exe)


def num_outputs(h):
    return len(_objs[h].get_output_layouts())


def buffer_from_bytes(data, dtype, dims):
    arr = np.frombuffer(bytes(data), dtype=_DTYPES[dtype]).reshape(tuple(dims))
    return _put(_client.buffer_from_pyval(arr, _client.local_devices()[0]))


def execute(h, arg_handles):
    outs = _objs[h].execute([_objs[a] for a in arg_handles])
    return [_put(o) for o in outs]


def buffer_to_bytes(h):
    return np.ascontiguousarray(np.asarray(_objs[h])).tobytes()


def buffer_dims(h):
    return list(np.asarray(_objs[h]).shape)


def buffer_dtype(h):
    return _NAMES[np.asarray(_objs[h]).dtype]


def destroy(h):
    _objs.pop(h, None)
)PY";

std::mutex g_mu;
PyObject* g_ns = nullptr;  // module namespace dict

class Gil {
  public:
    Gil() : state_(PyGILState_Ensure()) {}
    ~Gil() { PyGILState_Release(state_); }

  private:
    PyGILState_STATE state_;
};

PJRT_Error* ensure_python() {
    std::lock_guard<std::mutex> lock(g_mu);
    if (g_ns) return nullptr;
    // The shim is usually dlopen'd RTLD_LOCAL (the standard way to load a
    // PJRT plugin), which keeps libpython's symbols out of the global
    // namespace — but Python C-extension modules (numpy etc.) link against
    // the interpreter's exported symbols. Promote the already-mapped
    // libpython to RTLD_GLOBAL before initializing.
    if (!dlopen(PYSHIM_LIBPYTHON_SONAME,
                RTLD_NOW | RTLD_GLOBAL | RTLD_NOLOAD))
        dlopen(PYSHIM_LIBPYTHON_SONAME, RTLD_NOW | RTLD_GLOBAL);
    if (!Py_IsInitialized()) Py_InitializeEx(0);
    Gil gil;
    PyObject* mod = PyImport_AddModule("__fnn_pjrt_shim__");  // borrowed
    if (!mod) return python_error("AddModule");
    g_ns = PyModule_GetDict(mod);  // borrowed, lives with the module
    Py_INCREF(g_ns);
    PyObject* r = PyRun_String(kPyHelper, Py_file_input, g_ns, g_ns);
    if (!r) return python_error("helper exec");
    Py_DECREF(r);
    return nullptr;
}

// Call helper fn with args; returns new ref or null (python error pending).
PyObject* call(const char* fn, PyObject* args) {
    PyObject* f = PyDict_GetItemString(g_ns, fn);  // borrowed
    if (!f) return nullptr;
    PyObject* r = PyObject_CallObject(f, args);
    Py_XDECREF(args);
    return r;
}

// Handle-carrying opaque objects. PJRT_Client is a singleton tag; buffers and
// executables carry registry handles plus cached metadata for the
// Dimensions/ElementType accessors (which hand out borrowed pointers).
struct ShimBuffer {
    int64_t handle;
    std::vector<int64_t> dims;
    PJRT_Buffer_Type type;
};
struct ShimExecutable {
    int64_t handle;
    size_t num_outputs;
};
struct ShimClient {
    int dummy = 0;
};
ShimClient g_client;
// one fake device: PJRT_Device* values only need to be stable pointers
int g_device_tag = 0;
PJRT_Device* g_devices[1] = {reinterpret_cast<PJRT_Device*>(&g_device_tag)};

const char* dtype_name(PJRT_Buffer_Type t) {
    switch (t) {
        case PJRT_Buffer_Type_F32: return "f32";
        case PJRT_Buffer_Type_BF16: return "bf16";
        case PJRT_Buffer_Type_F16: return "f16";
        case PJRT_Buffer_Type_F64: return "f64";
        case PJRT_Buffer_Type_S8: return "s8";
        case PJRT_Buffer_Type_S16: return "s16";
        case PJRT_Buffer_Type_S32: return "s32";
        case PJRT_Buffer_Type_S64: return "s64";
        case PJRT_Buffer_Type_U8: return "u8";
        case PJRT_Buffer_Type_U16: return "u16";
        case PJRT_Buffer_Type_U32: return "u32";
        case PJRT_Buffer_Type_U64: return "u64";
        case PJRT_Buffer_Type_PRED: return "pred";
        default: return nullptr;
    }
}

PJRT_Buffer_Type dtype_from_name(const char* n) {
    std::string s(n);
    if (s == "f32") return PJRT_Buffer_Type_F32;
    if (s == "bf16") return PJRT_Buffer_Type_BF16;
    if (s == "f16") return PJRT_Buffer_Type_F16;
    if (s == "f64") return PJRT_Buffer_Type_F64;
    if (s == "s8") return PJRT_Buffer_Type_S8;
    if (s == "s16") return PJRT_Buffer_Type_S16;
    if (s == "s32") return PJRT_Buffer_Type_S32;
    if (s == "s64") return PJRT_Buffer_Type_S64;
    if (s == "u8") return PJRT_Buffer_Type_U8;
    if (s == "u16") return PJRT_Buffer_Type_U16;
    if (s == "u32") return PJRT_Buffer_Type_U32;
    if (s == "u64") return PJRT_Buffer_Type_U64;
    if (s == "pred") return PJRT_Buffer_Type_PRED;
    return PJRT_Buffer_Type_INVALID;
}

size_t dtype_bytes(PJRT_Buffer_Type t) {
    switch (t) {
        case PJRT_Buffer_Type_PRED:
        case PJRT_Buffer_Type_S8:
        case PJRT_Buffer_Type_U8: return 1;
        case PJRT_Buffer_Type_F16:
        case PJRT_Buffer_Type_BF16:
        case PJRT_Buffer_Type_S16:
        case PJRT_Buffer_Type_U16: return 2;
        case PJRT_Buffer_Type_F32:
        case PJRT_Buffer_Type_S32:
        case PJRT_Buffer_Type_U32: return 4;
        default: return 8;
    }
}

int64_t destroy_py_handle(int64_t h) {
    Gil gil;
    PyObject* r = call("destroy", Py_BuildValue("(L)", (long long)h));
    Py_XDECREF(r);
    PyErr_Clear();
    return 0;
}

// --------------------------------------------------------------- API methods
void Error_Destroy(PJRT_Error_Destroy_Args* args) {
    delete as_shim(args->error);
}

void Error_Message(PJRT_Error_Message_Args* args) {
    ShimError* e = as_shim(args->error);
    args->message = e->message.c_str();
    args->message_size = e->message.size();
}

PJRT_Error* Error_GetCode(PJRT_Error_GetCode_Args* args) {
    args->code = as_shim(args->error)->code;
    return nullptr;
}

PJRT_Error* Plugin_Initialize(PJRT_Plugin_Initialize_Args*) {
    return ensure_python();
}

PJRT_Error* Plugin_Attributes(PJRT_Plugin_Attributes_Args* args) {
    args->attributes = nullptr;
    args->num_attributes = 0;
    return nullptr;
}

PJRT_Error* Client_Create(PJRT_Client_Create_Args* args) {
    if (auto* e = ensure_python()) return e;
    Gil gil;
    PyObject* r = call("create_client", nullptr);
    if (!r) return python_error("create_client");
    Py_DECREF(r);
    args->client = reinterpret_cast<PJRT_Client*>(&g_client);
    return nullptr;
}

PJRT_Error* Client_Destroy(PJRT_Client_Destroy_Args*) { return nullptr; }

PJRT_Error* Client_PlatformName(PJRT_Client_PlatformName_Args* args) {
    static const char kName[] = "cpu-pyshim";
    args->platform_name = kName;
    args->platform_name_size = sizeof(kName) - 1;
    return nullptr;
}

PJRT_Error* Client_Devices(PJRT_Client_Devices_Args* args) {
    args->devices = g_devices;
    args->num_devices = 1;
    return nullptr;
}

PJRT_Error* Client_AddressableDevices(
    PJRT_Client_AddressableDevices_Args* args) {
    args->addressable_devices = g_devices;
    args->num_addressable_devices = 1;
    return nullptr;
}

PJRT_Error* Client_Compile(PJRT_Client_Compile_Args* args) {
    Gil gil;
    PyObject* code = PyBytes_FromStringAndSize(args->program->code,
                                               args->program->code_size);
    if (!code) return python_error("code bytes");
    PyObject* r = call("compile_mlir", Py_BuildValue("(N)", code));
    if (!r) return python_error("compile_mlir");
    int64_t h = PyLong_AsLongLong(r);
    Py_DECREF(r);
    PyObject* n = call("num_outputs", Py_BuildValue("(L)", (long long)h));
    if (!n) return python_error("num_outputs");
    auto* exe = new ShimExecutable{h, (size_t)PyLong_AsLongLong(n)};
    Py_DECREF(n);
    args->executable = reinterpret_cast<PJRT_LoadedExecutable*>(exe);
    return nullptr;
}

PJRT_Error* LoadedExecutable_Destroy(PJRT_LoadedExecutable_Destroy_Args* args) {
    auto* exe = reinterpret_cast<ShimExecutable*>(args->executable);
    if (exe) destroy_py_handle(exe->handle);
    delete exe;
    return nullptr;
}

// GetExecutable/NumOutputs: the backend asks the inner executable for its
// output count; the shim hands back the same object.
PJRT_Error* LoadedExecutable_GetExecutable(
    PJRT_LoadedExecutable_GetExecutable_Args* args) {
    auto* exe = reinterpret_cast<ShimExecutable*>(args->loaded_executable);
    args->executable =
        reinterpret_cast<PJRT_Executable*>(new ShimExecutable(*exe));
    return nullptr;
}

PJRT_Error* Executable_Destroy(PJRT_Executable_Destroy_Args* args) {
    delete reinterpret_cast<ShimExecutable*>(args->executable);
    return nullptr;
}

PJRT_Error* Executable_NumOutputs(PJRT_Executable_NumOutputs_Args* args) {
    args->num_outputs =
        reinterpret_cast<ShimExecutable*>(args->executable)->num_outputs;
    return nullptr;
}

PJRT_Error* Client_BufferFromHostBuffer(
    PJRT_Client_BufferFromHostBuffer_Args* args) {
    if (args->num_byte_strides != 0)
        return make_error("pyshim supports dense major-to-minor input only",
                          PJRT_Error_Code_UNIMPLEMENTED);
    const char* dname = dtype_name(args->type);
    if (!dname)
        return make_error("pyshim: unsupported dtype",
                          PJRT_Error_Code_UNIMPLEMENTED);
    size_t n = dtype_bytes(args->type);
    for (size_t d = 0; d < args->num_dims; ++d) n *= size_t(args->dims[d]);

    Gil gil;
    PyObject* data = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(args->data), Py_ssize_t(n));
    PyObject* dims = PyTuple_New(Py_ssize_t(args->num_dims));
    for (size_t d = 0; d < args->num_dims; ++d)
        PyTuple_SetItem(dims, Py_ssize_t(d),
                        PyLong_FromLongLong(args->dims[d]));
    PyObject* r =
        call("buffer_from_bytes", Py_BuildValue("(NsN)", data, dname, dims));
    if (!r) return python_error("buffer_from_bytes");
    auto* buf = new ShimBuffer{PyLong_AsLongLong(r),
                               std::vector<int64_t>(args->dims,
                                                    args->dims + args->num_dims),
                               args->type};
    Py_DECREF(r);
    args->buffer = reinterpret_cast<PJRT_Buffer*>(buf);
    args->done_with_host_buffer = nullptr;  // transfer completed synchronously
    return nullptr;
}

PJRT_Error* LoadedExecutable_Execute(PJRT_LoadedExecutable_Execute_Args* args) {
    auto* exe = reinterpret_cast<ShimExecutable*>(args->executable);
    if (args->num_devices != 1)
        return make_error("pyshim is single-device",
                          PJRT_Error_Code_UNIMPLEMENTED);
    Gil gil;
    PyObject* handles = PyList_New(Py_ssize_t(args->num_args));
    for (size_t a = 0; a < args->num_args; ++a) {
        auto* b = reinterpret_cast<const ShimBuffer*>(args->argument_lists[0][a]);
        PyList_SetItem(handles, Py_ssize_t(a),
                       PyLong_FromLongLong(b->handle));
    }
    PyObject* r = call("execute",
                       Py_BuildValue("(LN)", (long long)exe->handle, handles));
    if (!r) return python_error("execute");
    Py_ssize_t n_out = PyList_Size(r);
    for (Py_ssize_t o = 0; o < n_out && o < Py_ssize_t(exe->num_outputs); ++o) {
        int64_t h = PyLong_AsLongLong(PyList_GetItem(r, o));
        // fetch dims/dtype for the accessors
        PyObject* d = call("buffer_dims", Py_BuildValue("(L)", (long long)h));
        PyObject* t = call("buffer_dtype", Py_BuildValue("(L)", (long long)h));
        if (!d || !t) {
            Py_XDECREF(d);
            Py_XDECREF(t);
            Py_DECREF(r);
            return python_error("output metadata");
        }
        auto* buf = new ShimBuffer;
        buf->handle = h;
        for (Py_ssize_t i = 0; i < PyList_Size(d); ++i)
            buf->dims.push_back(PyLong_AsLongLong(PyList_GetItem(d, i)));
        buf->type = dtype_from_name(PyUnicode_AsUTF8(t));
        Py_DECREF(d);
        Py_DECREF(t);
        args->output_lists[0][o] = reinterpret_cast<PJRT_Buffer*>(buf);
    }
    Py_DECREF(r);
    if (args->device_complete_events)
        args->device_complete_events[0] = nullptr;  // synchronous
    return nullptr;
}

PJRT_Error* Buffer_Destroy(PJRT_Buffer_Destroy_Args* args) {
    auto* b = reinterpret_cast<ShimBuffer*>(args->buffer);
    if (b) destroy_py_handle(b->handle);
    delete b;
    return nullptr;
}

PJRT_Error* Buffer_ElementType(PJRT_Buffer_ElementType_Args* args) {
    args->type = reinterpret_cast<ShimBuffer*>(args->buffer)->type;
    return nullptr;
}

PJRT_Error* Buffer_Dimensions(PJRT_Buffer_Dimensions_Args* args) {
    auto* b = reinterpret_cast<ShimBuffer*>(args->buffer);
    args->dims = b->dims.data();
    args->num_dims = b->dims.size();
    return nullptr;
}

PJRT_Error* Buffer_ToHostBuffer(PJRT_Buffer_ToHostBuffer_Args* args) {
    auto* b = reinterpret_cast<ShimBuffer*>(args->src);
    size_t n = dtype_bytes(b->type);
    for (int64_t d : b->dims) n *= size_t(d);
    if (!args->dst) {
        args->dst_size = n;
        args->event = nullptr;
        return nullptr;
    }
    if (args->dst_size < n)
        return make_error("dst too small", PJRT_Error_Code_INVALID_ARGUMENT);
    Gil gil;
    PyObject* r =
        call("buffer_to_bytes", Py_BuildValue("(L)", (long long)b->handle));
    if (!r) return python_error("buffer_to_bytes");
    char* raw;
    Py_ssize_t len;
    PyBytes_AsStringAndSize(r, &raw, &len);
    std::memcpy(args->dst, raw, size_t(len));
    Py_DECREF(r);
    args->event = nullptr;  // copy completed synchronously
    return nullptr;
}

// Synchronous shim: events are never created, but the consumer may still
// call Await/Destroy on a null-safe basis.
PJRT_Error* Event_Await(PJRT_Event_Await_Args*) { return nullptr; }
PJRT_Error* Event_Destroy(PJRT_Event_Destroy_Args*) { return nullptr; }

PJRT_Api g_api = [] {
    PJRT_Api api{};
    api.struct_size = PJRT_Api_STRUCT_SIZE;
    api.pjrt_api_version.struct_size = PJRT_Api_Version_STRUCT_SIZE;
    api.pjrt_api_version.major_version = PJRT_API_MAJOR;
    api.pjrt_api_version.minor_version = PJRT_API_MINOR;
    api.PJRT_Error_Destroy = Error_Destroy;
    api.PJRT_Error_Message = Error_Message;
    api.PJRT_Error_GetCode = Error_GetCode;
    api.PJRT_Plugin_Initialize = Plugin_Initialize;
    api.PJRT_Plugin_Attributes = Plugin_Attributes;
    api.PJRT_Client_Create = Client_Create;
    api.PJRT_Client_Destroy = Client_Destroy;
    api.PJRT_Client_PlatformName = Client_PlatformName;
    api.PJRT_Client_Devices = Client_Devices;
    api.PJRT_Client_AddressableDevices = Client_AddressableDevices;
    api.PJRT_Client_Compile = Client_Compile;
    api.PJRT_Client_BufferFromHostBuffer = Client_BufferFromHostBuffer;
    api.PJRT_LoadedExecutable_Destroy = LoadedExecutable_Destroy;
    api.PJRT_LoadedExecutable_GetExecutable = LoadedExecutable_GetExecutable;
    api.PJRT_LoadedExecutable_Execute = LoadedExecutable_Execute;
    api.PJRT_Executable_Destroy = Executable_Destroy;
    api.PJRT_Executable_NumOutputs = Executable_NumOutputs;
    api.PJRT_Buffer_Destroy = Buffer_Destroy;
    api.PJRT_Buffer_ElementType = Buffer_ElementType;
    api.PJRT_Buffer_Dimensions = Buffer_Dimensions;
    api.PJRT_Buffer_ToHostBuffer = Buffer_ToHostBuffer;
    api.PJRT_Event_Await = Event_Await;
    api.PJRT_Event_Destroy = Event_Destroy;
    return api;
}();

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() { return &g_api; }
