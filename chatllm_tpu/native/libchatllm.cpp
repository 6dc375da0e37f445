// libchatllm.so — C ABI for chatllm_tpu, binary-compatible with the
// reference's /root/reference/bindings/libchatllm.h (all 40+ chatllm_*
// entry points), so the reference's own bindings (chatllm.py ctypes,
// main.c, Nim/TS/Pascal) run unmodified against this engine.
//
// Design: a thin CPython-embedding shim.  The engine logic lives in
// chatllm_tpu/api.py (class ChatLLM — same param strings, same typed-stream
// protocol); this file owns (a) interpreter lifecycle — embeds Python when
// the host is a C/Nim/etc. process, reuses the running interpreter when
// loaded INTO a Python process via ctypes, (b) GIL discipline, (c) C<->Py
// callback trampolines for the f_print/f_end streaming protocol, and
// (d) std::thread workers for the chatllm_async_* family
// (reference impl analog: /root/reference/src/main.cpp:1640-2300).
//
// Build: chatllm_tpu/native/build_libchatllm.py (g++ + python3-config).

#ifndef _GNU_SOURCE
#define _GNU_SOURCE
#endif
#include <Python.h>

#include <dlfcn.h>

#include <atomic>
#include <climits>
#include <cstdio>
#include <cstring>
#include <string>
#include <functional>
#include <thread>
#include <chrono>
#include <vector>

#define API_CALL
#define DLL_DECL extern "C" __attribute__((visibility("default")))

typedef void (*f_chatllm_print)(void *user_data, int print_type, const char *utf8_str);
typedef void (*f_chatllm_end)(void *user_data);
typedef void (*f_chatllm_lens_callback)(void *user_data, int layer_id, int n_tokens,
                                        const float *logits, const int *ordering);

enum PrintType {
    PRINT_CHAT_CHUNK = 0,
    PRINTLN_ERROR = 2,
    PRINTLN_EMBEDDING = 8,
    PRINTLN_RANKING = 9,
    PRINTLN_TOKEN_IDS = 10,
    PRINT_THOUGHT_CHUNK = 14,
    PRINT_EVT_ASYNC_COMPLETED = 100,
};

struct chatllm_obj;  // opaque

namespace {

struct Obj {
    PyObject *py = nullptr;            // chatllm_tpu.api.ChatLLM instance
    f_chatllm_print f_print = nullptr;
    f_chatllm_end f_end = nullptr;
    void *user_data = nullptr;
    f_chatllm_lens_callback f_lens = nullptr;
    void *lens_user_data = nullptr;
    std::atomic<int> inflight{0};      // detached async workers alive
    std::atomic<int> async_result{INT_MIN};
    std::atomic<bool> async_busy{false};
    std::atomic<std::thread::id> worker_tid{};  // set while a worker runs
    std::atomic<bool> deferred_destroy{false};  // destroy() from callback
    std::string vocab_buf;             // chatllm_get_token_vocab storage
};

std::vector<std::string> g_init_params;
bool g_we_initialized_python = false;
PyThreadState *g_main_ts = nullptr;

void emit(Obj *o, int type, const char *s) {
    if (o->f_print) o->f_print(o->user_data, type, s ? s : "");
}

// ---------------------------------------------------------------- GIL RAII
struct Gil {
    PyGILState_STATE st;
    Gil() { st = PyGILState_Ensure(); }
    ~Gil() { PyGILState_Release(st); }
};

int err_to_int(Obj *o, const char *where) {
    // surface the Python traceback on the typed stream, then stderr
    PyObject *t, *v, *tb;
    PyErr_Fetch(&t, &v, &tb);
    PyObject *s = v ? PyObject_Str(v) : nullptr;
    std::string msg = std::string(where) + ": " +
        (s && PyUnicode_Check(s) ? PyUnicode_AsUTF8(s) : "unknown error");
    Py_XDECREF(s);
    PyErr_Restore(t, v, tb);
    PyErr_Print();
    if (o) {
        Py_BEGIN_ALLOW_THREADS
        emit(o, PRINTLN_ERROR, msg.c_str());
        Py_END_ALLOW_THREADS
    } else {
        fprintf(stderr, "%s\n", msg.c_str());
    }
    return -1;
}

// --------------------------------------------------- Py -> C trampolines
// `self` of each PyCFunction is a capsule holding the Obj*.
Obj *capsule_obj(PyObject *self) {
    return static_cast<Obj *>(PyCapsule_GetPointer(self, "chatllm_obj"));
}

PyObject *tramp_print(PyObject *self, PyObject *args) {
    const char *s;
    if (!PyArg_ParseTuple(args, "s", &s)) return nullptr;
    Obj *o = capsule_obj(self);
    // release the GIL around the host callback: the header allows the host
    // to call back into chatllm_* (abort + tool_completion) from f_print
    Py_BEGIN_ALLOW_THREADS
    emit(o, PRINT_CHAT_CHUNK, s);
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyObject *tramp_print_meta(PyObject *self, PyObject *args) {
    const char *s;
    int type;
    if (!PyArg_ParseTuple(args, "si", &s, &type)) return nullptr;
    Obj *o = capsule_obj(self);
    Py_BEGIN_ALLOW_THREADS
    emit(o, type, s);
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyObject *tramp_thought(PyObject *self, PyObject *args) {
    const char *s;
    if (!PyArg_ParseTuple(args, "s", &s)) return nullptr;
    Obj *o = capsule_obj(self);
    Py_BEGIN_ALLOW_THREADS
    emit(o, PRINT_THOUGHT_CHUNK, s);
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyObject *tramp_end(PyObject *self, PyObject *) {
    Obj *o = capsule_obj(self);
    Py_BEGIN_ALLOW_THREADS
    if (o->f_end) o->f_end(o->user_data);
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyMethodDef k_tramp_print = {"on_print", tramp_print, METH_VARARGS, nullptr};
PyMethodDef k_tramp_print_meta = {"on_print_meta", tramp_print_meta, METH_VARARGS, nullptr};
PyMethodDef k_tramp_thought = {"on_thought", tramp_thought, METH_VARARGS, nullptr};
PyMethodDef k_tramp_end = {"on_end", tramp_end, METH_NOARGS, nullptr};

// ------------------------------------------------------------- utilities
std::string own_dir() {
    Dl_info info;
    if (dladdr(reinterpret_cast<void *>(&emit), &info) && info.dli_fname) {
        std::string p(info.dli_fname);
        size_t i = p.rfind('/');
        if (i != std::string::npos) return p.substr(0, i);
    }
    return ".";
}

int ensure_repo_on_path() {
    // the repo root is the dir containing chatllm_tpu/ — walk up from the
    // .so's location so the library is relocatable within the tree
    std::string d = own_dir();
    PyObject *sys_path = PySys_GetObject("path");  // borrowed
    if (!sys_path) return -1;
    for (int up = 0; up < 4; up++) {
        std::string probe = d + "/chatllm_tpu/__init__.py";
        FILE *f = fopen(probe.c_str(), "r");
        if (f) {
            fclose(f);
            PyObject *s = PyUnicode_FromString(d.c_str());
            PyList_Insert(sys_path, 0, s);
            Py_DECREF(s);
            return 0;
        }
        size_t i = d.rfind('/');
        if (i == std::string::npos || i == 0) break;
        d = d.substr(0, i);
    }
    return 0;  // maybe already importable from site-packages
}

PyObject *call_method(Obj *o, const char *name, const char *fmt, ...) {
    PyObject *m = PyObject_GetAttrString(o->py, name);
    if (!m) return nullptr;
    PyObject *r;
    if (fmt && *fmt) {
        va_list va;
        va_start(va, fmt);
        PyObject *args = Py_VaBuildValue(fmt, va);
        va_end(va);
        if (!args) { Py_DECREF(m); return nullptr; }
        if (!PyTuple_Check(args)) {
            PyObject *t = PyTuple_Pack(1, args);
            Py_DECREF(args);
            args = t;
        }
        r = PyObject_CallObject(m, args);
        Py_DECREF(args);
    } else {
        r = PyObject_CallObject(m, nullptr);
    }
    Py_DECREF(m);
    return r;
}

int simple_call(Obj *obj, const char *name, const char *fmt, ...) {
    if (!obj || !obj->py) return -1;
    Gil g;
    PyObject *m = PyObject_GetAttrString(obj->py, name);
    if (!m) return err_to_int(obj, name);
    PyObject *args = nullptr;
    if (fmt && *fmt) {
        va_list va;
        va_start(va, fmt);
        args = Py_VaBuildValue(fmt, va);
        va_end(va);
        if (args && !PyTuple_Check(args)) {
            PyObject *t = PyTuple_Pack(1, args);
            Py_DECREF(args);
            args = t;
        }
        if (!args) { Py_DECREF(m); return err_to_int(obj, name); }
    }
    PyObject *r = PyObject_CallObject(m, args);
    Py_XDECREF(args);
    Py_DECREF(m);
    if (!r) return err_to_int(obj, name);
    int rc = 0;
    if (PyLong_Check(r)) rc = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return rc >= 0 ? 0 : rc;
}

// run a sync op in a DETACHED worker thread; emit PRINT_EVT_ASYNC_COMPLETED
// when done.  Detached (matching the reference's ASYNC_FUN_BODY,
// /root/reference/src/main.cpp:1864) so the host may chain the next
// chatllm_async_* call from inside the completion callback — a joining
// design would self-join the worker thread there and std::terminate.
// busy clears BEFORE the completion event so that chained call succeeds;
// `inflight` keeps chatllm_destroy from freeing the object while any
// worker (including one still inside emit) is alive.
void destroy_obj(Obj *o) {
    {
        Gil g;
        Py_XDECREF(o->py);
    }
    delete o;
}

int run_async(Obj *o, std::function<int()> fn) {
    if (!o) return -1;
    // inflight is raised BEFORE the busy CAS so chatllm_destroy's
    // inflight==0 wait covers the whole launch window (a destroy racing
    // the old CAS→fetch_add gap could free the Obj under the new worker)
    o->inflight.fetch_add(1);
    bool expected = false;
    if (!o->async_busy.compare_exchange_strong(expected, true)) {
        o->inflight.fetch_sub(1);
        return -1;
    }
    o->async_result.store(INT_MIN);
    std::thread([o, fn]() {
        o->worker_tid.store(std::this_thread::get_id());
        int r = fn();
        o->async_result.store(r);
        o->async_busy.store(false);
        emit(o, PRINT_EVT_ASYNC_COMPLETED, "");
        o->worker_tid.store(std::thread::id());
        // last worker out performs a teardown that chatllm_destroy
        // deferred because it was invoked from OUR completion callback
        if (o->inflight.fetch_sub(1) == 1 && o->deferred_destroy.load())
            destroy_obj(o);
    }).detach();
    return 0;
}

}  // namespace

// ===================================================================== API

DLL_DECL void API_CALL chatllm_append_init_param(const char *utf8_str) {
    if (utf8_str) g_init_params.push_back(utf8_str);
}

DLL_DECL int API_CALL chatllm_init(void) {
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
        g_we_initialized_python = true;
    }
    {
        PyGILState_STATE st = PyGILState_Ensure();
        ensure_repo_on_path();
        // the axon sitecustomize forces the tunneled TPU backend; honor
        // CHATLLM_TPU_PLATFORM for host-side / CI use (must be set BEFORE
        // the first jax computation)
        PyRun_SimpleString(
            "import os\n"
            "_p = os.environ.get('CHATLLM_TPU_PLATFORM')\n"
            "if _p:\n"
            "    import jax\n"
            "    jax.config.update('jax_platforms', _p)\n");
        PyObject *mod = PyImport_ImportModule("chatllm_tpu.api");
        int rc = mod ? 0 : -1;
        if (!mod) PyErr_Print();
        Py_XDECREF(mod);
        PyGILState_Release(st);
        if (rc != 0) return rc;
    }
    if (g_we_initialized_python && g_main_ts == nullptr) {
        // release the GIL from the embedding thread so workers can run
        g_main_ts = PyEval_SaveThread();
    }
    return 0;
}

DLL_DECL struct chatllm_obj *API_CALL chatllm_create(void) {
    if (chatllm_init() != 0) return nullptr;
    Gil g;
    PyObject *mod = PyImport_ImportModule("chatllm_tpu.api");
    if (!mod) { PyErr_Print(); return nullptr; }
    PyObject *cls = PyObject_GetAttrString(mod, "ChatLLM");
    Py_DECREF(mod);
    if (!cls) { PyErr_Print(); return nullptr; }
    PyObject *inst = PyObject_CallObject(cls, nullptr);
    Py_DECREF(cls);
    if (!inst) { PyErr_Print(); return nullptr; }
    Obj *o = new Obj;
    o->py = inst;
    // global init params apply to every object (reference src/main.cpp:1496)
    for (auto &p : g_init_params) {
        PyObject *r = call_method(o, "append_param", "(s)", p.c_str());
        if (!r) PyErr_Print(); else Py_DECREF(r);
    }
    return reinterpret_cast<chatllm_obj *>(o);
}

DLL_DECL int API_CALL chatllm_destroy(struct chatllm_obj *obj) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o) return 0;
    if (o->worker_tid.load() == std::this_thread::get_id()) {
        // destroy called from inside the async worker's own completion
        // callback (the chaining pattern run_async enables): spinning on
        // inflight here would never terminate — inflight is decremented
        // only after emit() returns.  Defer teardown to the worker.
        o->deferred_destroy.store(true);
        return 0;
    }
    while (o->inflight.load() > 0)     // wait out detached async workers
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
    destroy_obj(o);
    return 0;
}

DLL_DECL void API_CALL chatllm_append_param(struct chatllm_obj *obj, const char *utf8_str) {
    simple_call(reinterpret_cast<Obj *>(obj), "append_param", "(s)", utf8_str);
}

DLL_DECL int API_CALL chatllm_start(struct chatllm_obj *obj, f_chatllm_print f_print,
                                    f_chatllm_end f_end, void *user_data) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o) return -1;
    o->f_print = f_print;
    o->f_end = f_end;
    o->user_data = user_data;
    Gil g;
    PyObject *cap = PyCapsule_New(o, "chatllm_obj", nullptr);
    if (!cap) return err_to_int(o, "start");
    struct { const char *attr; PyMethodDef *def; } hooks[] = {
        {"on_print", &k_tramp_print},
        {"on_print_meta", &k_tramp_print_meta},
        {"on_thought", &k_tramp_thought},
        {"on_end", &k_tramp_end},
    };
    for (auto &h : hooks) {
        PyObject *fn = PyCFunction_New(h.def, cap);
        if (!fn || PyObject_SetAttrString(o->py, h.attr, fn) != 0) {
            Py_XDECREF(fn);
            Py_DECREF(cap);
            return err_to_int(o, "start");
        }
        Py_DECREF(fn);
    }
    Py_DECREF(cap);  // each PyCFunction holds its own reference
    PyObject *r = call_method(o, "start", nullptr);
    if (!r) return err_to_int(o, "start");
    Py_DECREF(r);
    return 0;
}

DLL_DECL void API_CALL chatllm_set_gen_max_tokens(struct chatllm_obj *obj, int gen_max_tokens) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o || !o->py) return;
    Gil g;
    PyObject *pipe = PyObject_GetAttrString(o->py, "pipeline");
    if (!pipe) { PyErr_Clear(); return; }
    PyObject *gc = PyObject_GetAttrString(pipe, "gen_config");
    if (gc) {
        PyObject *v = PyLong_FromLong(gen_max_tokens);
        PyObject_SetAttrString(gc, "max_new_tokens", v);
        Py_DECREF(v);
        Py_DECREF(gc);
    }
    Py_DECREF(pipe);
    if (PyErr_Occurred()) PyErr_Print();
}

DLL_DECL void API_CALL chatllm_restart(struct chatllm_obj *obj, const char *utf8_sys_prompt) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o) return;
    if (utf8_sys_prompt)
        simple_call(o, "restart", "(s)", utf8_sys_prompt);
    else
        simple_call(o, "restart", nullptr);
}

DLL_DECL void API_CALL chatllm_multimedia_msg_prepare(struct chatllm_obj *obj) {
    simple_call(reinterpret_cast<Obj *>(obj), "multimedia_msg_prepare", nullptr);
}

DLL_DECL int API_CALL chatllm_multimedia_msg_append(struct chatllm_obj *obj,
                                                    const char *type, const char *utf8_str) {
    return simple_call(reinterpret_cast<Obj *>(obj), "multimedia_msg_append",
                       "(ss)", type, utf8_str);
}

DLL_DECL void API_CALL chatllm_history_append(struct chatllm_obj *obj, int role_type,
                                              const char *utf8_str) {
    simple_call(reinterpret_cast<Obj *>(obj), "history_append", "(is)",
                role_type, utf8_str);
}

DLL_DECL int chatllm_history_append_multimedia_msg(struct chatllm_obj *obj, int role_type) {
    return simple_call(reinterpret_cast<Obj *>(obj),
                       "history_append_multimedia_msg", "(i)", role_type);
}

DLL_DECL int API_CALL chatllm_get_cursor(struct chatllm_obj *obj) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o || !o->py) return -1;
    Gil g;
    PyObject *r = call_method(o, "get_cursor", nullptr);
    if (!r) return err_to_int(o, "get_cursor");
    int v = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return v;
}

DLL_DECL int API_CALL chatllm_set_cursor(struct chatllm_obj *obj, int pos) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o || !o->py) return -1;
    Gil g;
    PyObject *r = call_method(o, "set_cursor", "(i)", pos);
    if (!r) return err_to_int(o, "set_cursor");
    int v = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return v;
}

DLL_DECL int API_CALL chatllm_user_input(struct chatllm_obj *obj, const char *utf8_str) {
    return simple_call(reinterpret_cast<Obj *>(obj), "chat", "(s)", utf8_str);
}

DLL_DECL int API_CALL chatllm_user_input_multimedia_msg(struct chatllm_obj *obj) {
    return simple_call(reinterpret_cast<Obj *>(obj), "user_input_multimedia_msg",
                       nullptr);
}

DLL_DECL int API_CALL chatllm_set_ai_prefix(struct chatllm_obj *obj, const char *utf8_str) {
    return simple_call(reinterpret_cast<Obj *>(obj), "set_ai_prefix", "(s)", utf8_str);
}

DLL_DECL int API_CALL chatllm_ai_continue(struct chatllm_obj *obj, const char *utf8_str) {
    return simple_call(reinterpret_cast<Obj *>(obj), "ai_continue", "(s)",
                       utf8_str ? utf8_str : "");
}

DLL_DECL int API_CALL chatllm_tool_input(struct chatllm_obj *obj, const char *utf8_str) {
    return simple_call(reinterpret_cast<Obj *>(obj), "tool_input", "(s)", utf8_str);
}

DLL_DECL int chatllm_tool_completion(struct chatllm_obj *obj, const char *utf8_str) {
    return simple_call(reinterpret_cast<Obj *>(obj), "tool_completion", "(s)", utf8_str);
}

DLL_DECL int chatllm_text_tokenize(struct chatllm_obj *obj, const char *utf8_str) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o || !o->py) return -1;
    Gil g;
    PyObject *r = call_method(o, "text_tokenize", "(s)", utf8_str);
    if (!r) return err_to_int(o, "text_tokenize");
    Py_ssize_t n = PyList_Size(r);
    std::string line;
    for (Py_ssize_t i = 0; i < n; i++) {
        if (i) line += ",";
        line += std::to_string(PyLong_AsLong(PyList_GetItem(r, i)));
    }
    Py_DECREF(r);
    Py_BEGIN_ALLOW_THREADS
    emit(o, PRINTLN_TOKEN_IDS, line.c_str());
    Py_END_ALLOW_THREADS
    return (int)n;
}

static int embedding_impl(Obj *o, const char *utf8_str, int purpose) {
    if (!o || !o->py) return -1;
    Gil g;
    PyObject *r = call_method(o, "embedding", "(si)", utf8_str, purpose);
    if (!r) return err_to_int(o, "embedding");
    Py_ssize_t n = PySequence_Size(r);
    std::string line;
    char buf[32];
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *it = PySequence_GetItem(r, i);
        snprintf(buf, sizeof buf, "%g", PyFloat_AsDouble(it));
        Py_DECREF(it);
        if (i) line += ",";
        line += buf;
    }
    Py_DECREF(r);
    Py_BEGIN_ALLOW_THREADS
    emit(o, PRINTLN_EMBEDDING, line.c_str());
    Py_END_ALLOW_THREADS
    return 0;
}

DLL_DECL int chatllm_embedding(struct chatllm_obj *obj, const char *utf8_str, int purpose) {
    return embedding_impl(reinterpret_cast<Obj *>(obj), utf8_str, purpose);
}

static int qa_rank_impl(Obj *o, const char *q, const char *a) {
    if (!o || !o->py) return -1;
    Gil g;
    PyObject *r = call_method(o, "qa_rank", "(ss)", q, a);
    if (!r) return err_to_int(o, "qa_rank");
    char buf[32];
    snprintf(buf, sizeof buf, "%g", PyFloat_AsDouble(r));
    Py_DECREF(r);
    Py_BEGIN_ALLOW_THREADS
    emit(o, PRINTLN_RANKING, buf);
    Py_END_ALLOW_THREADS
    return 0;
}

DLL_DECL int chatllm_qa_rank(struct chatllm_obj *obj, const char *utf8_str_q,
                             const char *utf8_str_a) {
    return qa_rank_impl(reinterpret_cast<Obj *>(obj), utf8_str_q, utf8_str_a);
}

DLL_DECL int chatllm_rag_select_store(struct chatllm_obj *obj, const char *name) {
    return simple_call(reinterpret_cast<Obj *>(obj), "rag_select_store", "(s)", name);
}

DLL_DECL void API_CALL chatllm_abort_generation(struct chatllm_obj *obj) {
    simple_call(reinterpret_cast<Obj *>(obj), "abort_generation", nullptr);
}

DLL_DECL void API_CALL chatllm_show_statistics(struct chatllm_obj *obj) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o || !o->py) return;
    Gil g;
    PyObject *r = call_method(o, "show_statistics", nullptr);
    if (!r) { err_to_int(o, "show_statistics"); return; }
    const char *s = PyUnicode_Check(r) ? PyUnicode_AsUTF8(r) : "";
    std::string copy(s ? s : "");
    Py_DECREF(r);
    Py_BEGIN_ALLOW_THREADS
    emit(o, PRINT_CHAT_CHUNK, copy.c_str());
    Py_END_ALLOW_THREADS
}

DLL_DECL int API_CALL chatllm_save_session(struct chatllm_obj *obj, const char *utf8_str) {
    return simple_call(reinterpret_cast<Obj *>(obj), "save_session", "(s)", utf8_str);
}

DLL_DECL int API_CALL chatllm_load_session(struct chatllm_obj *obj, const char *utf8_str) {
    return simple_call(reinterpret_cast<Obj *>(obj), "load_session", "(s)", utf8_str);
}

// ------------------------------------------------------------------ async

DLL_DECL int API_CALL chatllm_get_async_result_int(struct chatllm_obj *obj) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o) return INT_MIN;
    return o->async_busy.load() ? INT_MIN : o->async_result.load();
}

DLL_DECL int API_CALL chatllm_async_start(struct chatllm_obj *obj, f_chatllm_print f_print,
                                          f_chatllm_end f_end, void *user_data) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o) return -1;
    return run_async(o, [=]() { return chatllm_start(obj, f_print, f_end, user_data); });
}

DLL_DECL int API_CALL chatllm_async_user_input(struct chatllm_obj *obj, const char *utf8_str) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    std::string s(utf8_str ? utf8_str : "");
    return run_async(o, [obj, s]() { return chatllm_user_input(obj, s.c_str()); });
}

DLL_DECL int API_CALL chatllm_async_user_input_multimedia_msg(struct chatllm_obj *obj) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    return run_async(o, [obj]() { return chatllm_user_input_multimedia_msg(obj); });
}

DLL_DECL int API_CALL chatllm_async_ai_continue(struct chatllm_obj *obj, const char *utf8_str) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    std::string s(utf8_str ? utf8_str : "");
    return run_async(o, [obj, s]() { return chatllm_ai_continue(obj, s.c_str()); });
}

DLL_DECL int API_CALL chatllm_async_tool_input(struct chatllm_obj *obj, const char *utf8_str) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    std::string s(utf8_str ? utf8_str : "");
    return run_async(o, [obj, s]() { return chatllm_tool_input(obj, s.c_str()); });
}

DLL_DECL int chatllm_async_tool_completion(struct chatllm_obj *obj, const char *utf8_str) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    std::string s(utf8_str ? utf8_str : "");
    return run_async(o, [obj, s]() { return chatllm_tool_completion(obj, s.c_str()); });
}

DLL_DECL int chatllm_async_embedding(struct chatllm_obj *obj, const char *utf8_str, int purpose) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    std::string s(utf8_str ? utf8_str : "");
    return run_async(o, [obj, s, purpose]() { return chatllm_embedding(obj, s.c_str(), purpose); });
}

DLL_DECL int chatllm_async_qa_rank(struct chatllm_obj *obj, const char *utf8_str_q,
                                   const char *utf8_str_a) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    std::string q(utf8_str_q ? utf8_str_q : ""), a(utf8_str_a ? utf8_str_a : "");
    return run_async(o, [obj, q, a]() { return chatllm_qa_rank(obj, q.c_str(), a.c_str()); });
}

// ------------------------------------------------------- C-friendly extras

DLL_DECL const char *chatllm_get_token_vocab(struct chatllm_obj *obj, int *n_vocab, int *width) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o || !o->py) return nullptr;
    Gil g;
    PyObject *r = call_method(o, "token_vocab", nullptr);
    if (!r) { err_to_int(o, "token_vocab"); return nullptr; }
    Py_ssize_t n = PyList_Size(r);
    size_t maxlen = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t len = PyBytes_Size(PyList_GetItem(r, i));
        if ((size_t)len > maxlen) maxlen = (size_t)len;
    }
    size_t w = maxlen + 1;  // 0-padded to max length + 1 (libchatllm.h:476)
    o->vocab_buf.assign(n * w, '\0');
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *b = PyList_GetItem(r, i);
        memcpy(&o->vocab_buf[i * w], PyBytes_AsString(b), PyBytes_Size(b));
    }
    Py_DECREF(r);
    if (n_vocab) *n_vocab = (int)n;
    if (width) *width = (int)w;
    return o->vocab_buf.data();
}

DLL_DECL void chatllm_set_lens_callback(struct chatllm_obj *obj,
                                        f_chatllm_lens_callback f_callback, void *user_data) {
    Obj *o = reinterpret_cast<Obj *>(obj);
    if (!o) return;
    o->f_lens = f_callback;
    o->lens_user_data = user_data;
    // lens logits flow through the Python API's CLI-equivalent --lens flags;
    // wiring per-layer float buffers across the ABI is documented as a
    // Python-side surface in docs/binding.md
}

DLL_DECL const char *chatllm_inspect_model(const char *model_path) {
    static std::string buf;
    if (chatllm_init() != 0) return nullptr;
    Gil g;
    PyObject *mod = PyImport_ImportModule("chatllm_tpu.ggmm.reader");
    if (!mod) { PyErr_Print(); return nullptr; }
    PyObject *cls = PyObject_GetAttrString(mod, "GGMMFile");
    Py_DECREF(mod);
    if (!cls) { PyErr_Print(); return nullptr; }
    PyObject *gf = PyObject_CallMethod(cls, "open", "(s)", model_path);
    Py_DECREF(cls);
    if (!gf) { PyErr_Print(); return nullptr; }
    PyObject *r = PyObject_CallMethod(gf, "describe", nullptr);
    Py_DECREF(gf);
    if (!r) { PyErr_Print(); return nullptr; }
    buf = PyUnicode_Check(r) ? PyUnicode_AsUTF8(r) : "";
    Py_DECREF(r);
    return buf.c_str();
}
