// cmlpl-pjrt-host — native serving runtime for exported scene predictors.
//
// The reference repo's only "deployment" story is re-running its training
// scripts (train.py:291-309 runs eval inline); cmlpl_tpu adds cli/serve.py
// (warm Python process) and utils/export.py (AOT StableHLO artifacts).
// This host closes the remaining gap: a standalone C++ binary that runs an
// exported artifact on TPU hardware with NO Python in the serving path —
// the pattern production TPU serving stacks use (load a PJRT plugin,
// compile once, execute many).
//
// It speaks only the PJRT C API (stable C ABI, pjrt_c_api.h), so the same
// binary drives any PJRT plugin: libtpu.so on a Cloud TPU VM, or this
// container's tunnel plugin (see native/pjrt_launcher.py for the local
// plugin discovery + client options).
//
// Usage:
//   pjrt_host --plugin libtpu.so --bundle DIR \
//       --cube cube.npy --spectra spectra.npy --out pred.npy \
//       [--copt k=v ...] [--repeat N] [--serve]
//
// Bundle layout (written by cli/export_model.py --native_dir):
//   module.stablehlo    StableHLO bytecode, weights baked in
//   compile_options.pb  serialized xla CompileOptionsProto
//   signature.txt       "input <name> <f32|i32|bf16> d0,d1,..." per arg +
//                       one "output ..." line — everything the host needs
//                       (meta.json is also present, for humans/Python)
//
// --serve reads requests from stdin, one per line: "cube.npy spectra.npy
// out.npy"; the executable stays warm between requests. A blank line or
// EOF exits. Responses ("ok <out> <ms>" / "error <msg>") go to stdout.
#include <dlfcn.h>
#include <unistd.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

std::string ErrStr(PJRT_Error* err) {
  PJRT_Error_Message_Args m;
  memset(&m, 0, sizeof(m));
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  std::string s(m.message, m.message_size);
  PJRT_Error_Destroy_Args d;
  memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  return s;
}

// Thrown for any failure; fatal at top level, but caught per-request in
// --serve mode so one bad request can't kill the warm server.
[[noreturn]] void Die(const std::string& what) {
  throw std::runtime_error(what);
}

#define CHECK_OK(expr)                                   \
  do {                                                   \
    PJRT_Error* _e = (expr);                             \
    if (_e) Die(std::string(#expr) + ": " + ErrStr(_e)); \
  } while (0)

#define INIT_ARGS(var, Type)                \
  Type var;                                 \
  memset(&var, 0, sizeof(var));             \
  var.struct_size = Type##_STRUCT_SIZE

void AwaitAndDestroy(PJRT_Event* ev) {
  INIT_ARGS(aw, PJRT_Event_Await_Args);
  aw.event = ev;
  PJRT_Error* err = g_api->PJRT_Event_Await(&aw);
  INIT_ARGS(de, PJRT_Event_Destroy_Args);
  de.event = ev;
  g_api->PJRT_Event_Destroy(&de);
  if (err) Die("event await: " + ErrStr(err));
}

// ---------------------------------------------------------------- npy I/O
// Minimal NumPy .npy v1.0/v2.0 reader/writer for C-order little-endian
// arrays — the only formats the Python side emits.

struct Npy {
  std::string dtype;  // "<f4" | "<i4" | "<u1"
  std::vector<int64_t> shape;
  std::vector<char> data;
  int64_t elems() const {
    int64_t n = 1;
    for (int64_t d : shape) n *= d;
    return n;
  }
};

Npy ReadNpy(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path);
  char magic[8];
  f.read(magic, 8);
  if (!f || memcmp(magic, "\x93NUMPY", 6) != 0) Die(path + ": not .npy");
  uint32_t hlen = 0;
  if (magic[6] == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string header(hlen, '\0');
  f.read(header.data(), hlen);

  auto find_val = [&](const std::string& key) -> std::string {
    size_t p = header.find("'" + key + "'");
    if (p == std::string::npos) Die(path + ": header missing " + key);
    p = header.find(':', p);
    return header.substr(p + 1);
  };
  std::string descr = find_val("descr");
  size_t q0 = descr.find('\'');
  size_t q1 = descr.find('\'', q0 + 1);
  Npy out;
  out.dtype = descr.substr(q0 + 1, q1 - q0 - 1);
  if (find_val("fortran_order").find("True") != std::string::npos)
    Die(path + ": fortran_order unsupported");
  std::string shp = find_val("shape");
  size_t l = shp.find('('), r = shp.find(')');
  std::stringstream ss(shp.substr(l + 1, r - l - 1));
  std::string tok;
  while (std::getline(ss, tok, ',')) {
    if (tok.find_first_of("0123456789") == std::string::npos) continue;
    out.shape.push_back(std::stoll(tok));
  }
  size_t itemsize = std::stoul(out.dtype.substr(2));
  out.data.resize(out.elems() * itemsize);
  f.read(out.data.data(), out.data.size());
  if (!f) Die(path + ": truncated data");
  return out;
}

void WriteNpy(const std::string& path, const std::string& dtype,
              const std::vector<int64_t>& shape, const void* data,
              size_t nbytes) {
  std::ostringstream hd;
  hd << "{'descr': '" << dtype << "', 'fortran_order': False, 'shape': (";
  for (size_t i = 0; i < shape.size(); ++i) hd << shape[i] << ", ";
  hd << "), }";
  std::string h = hd.str();
  size_t total = 10 + h.size();
  size_t pad = (64 - total % 64) % 64;
  h += std::string(pad, ' ');
  h += '\n';
  uint16_t hlen = static_cast<uint16_t>(h.size());
  std::ofstream f(path, std::ios::binary);
  if (!f) Die("cannot write " + path);
  f.write("\x93NUMPY\x01\x00", 8);
  f.write(reinterpret_cast<char*>(&hlen), 2);
  f.write(h.data(), h.size());
  f.write(static_cast<const char*>(data), nbytes);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

// ------------------------------------------------------------- signature

struct ArgSpec {
  std::string name;
  std::string dtype;  // f32 | i32 | bf16 | u8
  std::vector<int64_t> dims;
};

struct Signature {
  std::vector<ArgSpec> inputs;
  std::vector<ArgSpec> outputs;
};

Signature ParseSignature(const std::string& path) {
  std::ifstream f(path);
  if (!f) Die("cannot open " + path);
  Signature sig;
  std::string kind, name, dtype, dims;
  while (f >> kind >> name >> dtype >> dims) {
    ArgSpec a;
    a.name = name;
    a.dtype = dtype;
    if (dims != "-") {  // "-" = rank-0 scalar
      std::stringstream ss(dims);
      std::string tok;
      while (std::getline(ss, tok, ','))
        if (!tok.empty()) a.dims.push_back(std::stoll(tok));
    }
    if (kind == "input") sig.inputs.push_back(a);
    else if (kind == "output") sig.outputs.push_back(a);
    else Die(path + ": bad line kind " + kind);
  }
  if (sig.inputs.empty() || sig.outputs.empty())
    Die(path + ": needs >=1 input and output");
  return sig;
}

PJRT_Buffer_Type DtypeToPjrt(const std::string& d) {
  if (d == "f32") return PJRT_Buffer_Type_F32;
  if (d == "i32") return PJRT_Buffer_Type_S32;
  if (d == "u32") return PJRT_Buffer_Type_U32;
  if (d == "bf16") return PJRT_Buffer_Type_BF16;
  if (d == "u8") return PJRT_Buffer_Type_U8;
  Die("unsupported dtype " + d);
}

const char* DtypeToNpy(const std::string& d) {
  if (d == "f32") return "<f4";
  if (d == "i32") return "<i4";
  if (d == "u32") return "<u4";
  if (d == "u8") return "|u1";
  Die("no npy mapping for dtype " + d);
}

size_t DtypeSize(const std::string& d) {
  if (d == "f32" || d == "i32" || d == "u32") return 4;
  if (d == "bf16") return 2;
  if (d == "u8") return 1;
  Die("unsupported dtype " + d);
}

// ------------------------------------------------------------------ host

struct Host {
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* exec = nullptr;
  Signature sig;

  void CreateClient(const std::vector<std::pair<std::string, std::string>>&
                        copts) {
    std::vector<PJRT_NamedValue> nvs;
    nvs.reserve(copts.size());
    for (const auto& [k, v] : copts) {
      PJRT_NamedValue nv;
      memset(&nv, 0, sizeof(nv));
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = k.c_str();
      nv.name_size = k.size();
      char* end = nullptr;
      long long iv = strtoll(v.c_str(), &end, 10);
      if (!v.empty() && end && *end == '\0') {
        nv.type = PJRT_NamedValue_kInt64;
        nv.int64_value = iv;
        nv.value_size = 1;
      } else {
        nv.type = PJRT_NamedValue_kString;
        nv.string_value = v.c_str();
        nv.value_size = v.size();
      }
      nvs.push_back(nv);
    }
    INIT_ARGS(cc, PJRT_Client_Create_Args);
    cc.create_options = nvs.data();
    cc.num_options = nvs.size();
    CHECK_OK(g_api->PJRT_Client_Create(&cc));
    client = cc.client;

    INIT_ARGS(ad, PJRT_Client_AddressableDevices_Args);
    ad.client = client;
    CHECK_OK(g_api->PJRT_Client_AddressableDevices(&ad));
    if (ad.num_addressable_devices == 0) Die("no addressable devices");
    device = ad.addressable_devices[0];
  }

  void Compile(const std::string& module, const std::string& copts_pb) {
    PJRT_Program prog;
    memset(&prog, 0, sizeof(prog));
    prog.struct_size = PJRT_Program_STRUCT_SIZE;
    prog.code = const_cast<char*>(module.data());
    prog.code_size = module.size();
    static const char kFmt[] = "mlir";
    prog.format = kFmt;
    prog.format_size = sizeof(kFmt) - 1;

    INIT_ARGS(ca, PJRT_Client_Compile_Args);
    ca.client = client;
    ca.program = &prog;
    ca.compile_options = copts_pb.data();
    ca.compile_options_size = copts_pb.size();
    CHECK_OK(g_api->PJRT_Client_Compile(&ca));
    exec = ca.executable;
  }

  PJRT_Buffer* ToDevice(const ArgSpec& spec, const void* data) {
    INIT_ARGS(bh, PJRT_Client_BufferFromHostBuffer_Args);
    bh.client = client;
    bh.data = data;
    bh.type = DtypeToPjrt(spec.dtype);
    bh.dims = spec.dims.data();
    bh.num_dims = spec.dims.size();
    bh.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bh.device = device;
    CHECK_OK(g_api->PJRT_Client_BufferFromHostBuffer(&bh));
    AwaitAndDestroy(bh.done_with_host_buffer);
    return bh.buffer;
  }

  static void DestroyBuffers(const std::vector<PJRT_Buffer*>& bufs) {
    for (PJRT_Buffer* b : bufs) {
      if (b == nullptr) continue;
      INIT_ARGS(bd, PJRT_Buffer_Destroy_Args);
      bd.buffer = b;
      PJRT_Error* e = g_api->PJRT_Buffer_Destroy(&bd);
      if (e) fprintf(stderr, "pjrt_host: buffer destroy: %s\n",
                     ErrStr(e).c_str());
    }
  }

  // Executes on the single compiled device; returns host bytes per output.
  // Device buffers are destroyed on BOTH paths — a throwing request in
  // --serve mode must not leak cube-sized HBM into the warm server.
  std::vector<std::vector<char>> Run(
      const std::vector<const void*>& input_data) {
    std::vector<PJRT_Buffer*> in;
    std::vector<PJRT_Buffer*> outs(sig.outputs.size(), nullptr);
    try {
      in.reserve(sig.inputs.size());
      for (size_t i = 0; i < sig.inputs.size(); ++i)
        in.push_back(ToDevice(sig.inputs[i], input_data[i]));

      PJRT_ExecuteOptions eo;
      memset(&eo, 0, sizeof(eo));
      eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

      PJRT_Buffer* const* arg_list = in.data();
      PJRT_Buffer** out_list = outs.data();
      PJRT_Event* done = nullptr;

      INIT_ARGS(ex, PJRT_LoadedExecutable_Execute_Args);
      ex.executable = exec;
      ex.options = &eo;
      ex.argument_lists = &arg_list;
      ex.num_devices = 1;
      ex.num_args = in.size();
      ex.output_lists = &out_list;
      ex.device_complete_events = &done;
      CHECK_OK(g_api->PJRT_LoadedExecutable_Execute(&ex));
      AwaitAndDestroy(done);

      std::vector<std::vector<char>> host(outs.size());
      for (size_t i = 0; i < outs.size(); ++i) {
        INIT_ARGS(th, PJRT_Buffer_ToHostBuffer_Args);
        th.src = outs[i];
        CHECK_OK(g_api->PJRT_Buffer_ToHostBuffer(&th));  // size query
        host[i].resize(th.dst_size);
        th.dst = host[i].data();
        CHECK_OK(g_api->PJRT_Buffer_ToHostBuffer(&th));
        AwaitAndDestroy(th.event);
      }
      DestroyBuffers(outs);
      DestroyBuffers(in);
      return host;
    } catch (...) {
      DestroyBuffers(outs);
      DestroyBuffers(in);
      throw;
    }
  }
};

struct LoadedInput {
  Npy npy;
};

// Loads + validates the request inputs against the signature.
std::vector<Npy> LoadInputs(const Signature& sig,
                            const std::vector<std::string>& paths) {
  if (paths.size() != sig.inputs.size())
    Die("expected " + std::to_string(sig.inputs.size()) + " inputs, got " +
        std::to_string(paths.size()));
  std::vector<Npy> arrs;
  for (size_t i = 0; i < paths.size(); ++i) {
    Npy a = ReadNpy(paths[i]);
    const ArgSpec& spec = sig.inputs[i];
    if (a.dtype != DtypeToNpy(spec.dtype))
      Die(paths[i] + ": dtype " + a.dtype + ", signature wants " +
          spec.dtype);
    if (a.shape != spec.dims) {
      std::ostringstream ss;
      ss << paths[i] << ": shape mismatch vs signature for "
         << spec.name;
      Die(ss.str());
    }
    arrs.push_back(std::move(a));
  }
  return arrs;
}

double RunOnce(Host& host, const std::vector<Npy>& inputs,
               const std::string& out_path) {
  std::vector<const void*> ptrs;
  for (const Npy& a : inputs) ptrs.push_back(a.data.data());
  auto t0 = std::chrono::steady_clock::now();
  auto outs = host.Run(ptrs);
  double ms = std::chrono::duration<double, std::milli>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
  const ArgSpec& ospec = host.sig.outputs[0];
  WriteNpy(out_path, DtypeToNpy(ospec.dtype), ospec.dims, outs[0].data(),
           outs[0].size());
  return ms;
}

// Generic N-ary execution (training bundles and any other multi-input /
// multi-output program): inputs read from <indir>/<name>.npy per the
// signature, every output written to <outdir>/<name>.npy.
double RunGeneric(Host& host, const std::string& indir,
                  const std::string& outdir) {
  std::vector<std::string> paths;
  for (const ArgSpec& s : host.sig.inputs)
    paths.push_back(indir + "/" + s.name + ".npy");
  auto inputs = LoadInputs(host.sig, paths);
  std::vector<const void*> ptrs;
  for (const Npy& a : inputs) ptrs.push_back(a.data.data());
  auto t0 = std::chrono::steady_clock::now();
  auto outs = host.Run(ptrs);
  double ms = std::chrono::duration<double, std::milli>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
  for (size_t i = 0; i < outs.size(); ++i) {
    const ArgSpec& s = host.sig.outputs[i];
    WriteNpy(outdir + "/" + s.name + ".npy", DtypeToNpy(s.dtype), s.dims,
             outs[i].data(), outs[i].size());
  }
  return ms;
}

}  // namespace

static int RunMain(int argc, char** argv);

int main(int argc, char** argv) {
  try {
    return RunMain(argc, argv);
  } catch (const std::exception& e) {
    fprintf(stderr, "pjrt_host: %s\n", e.what());
    return 1;
  }
}

static int RunMain(int argc, char** argv) {
  std::string plugin, bundle, cube, spectra, out_path, indir, outdir;
  std::vector<std::pair<std::string, std::string>> copts;
  int repeat = 1;
  bool serve = false;
  // Plugin-free self-test modes (exercised by tests/test_native_host.py
  // on CPU CI where no PJRT plugin .so exists):
  //   --dump_signature DIR   parse DIR/signature.txt, print normalized
  //   --npy_roundtrip IN OUT read IN (.npy) and rewrite it to OUT
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (++i >= argc) Die("missing value for " + a);
      return argv[i];
    };
    if (a == "--plugin") plugin = next();
    else if (a == "--bundle") bundle = next();
    else if (a == "--cube") cube = next();
    else if (a == "--spectra") spectra = next();
    else if (a == "--out") out_path = next();
    else if (a == "--inputs") indir = next();
    else if (a == "--outdir") outdir = next();
    else if (a == "--repeat") repeat = std::stoi(next());
    else if (a == "--serve") serve = true;
    else if (a == "--dump_signature") {
      Signature sig = ParseSignature(next() + "/signature.txt");
      auto dump = [](const char* kind, const std::vector<ArgSpec>& v) {
        for (const ArgSpec& s : v) {
          printf("%s %s %s ", kind, s.name.c_str(), s.dtype.c_str());
          if (s.dims.empty()) printf("-");
          for (size_t j = 0; j < s.dims.size(); ++j)
            printf("%s%lld", j ? "," : "", (long long)s.dims[j]);
          printf("\n");
        }
      };
      dump("input", sig.inputs);
      dump("output", sig.outputs);
      return 0;
    } else if (a == "--npy_roundtrip") {
      std::string in = next();
      std::string out = next();
      Npy arr = ReadNpy(in);
      WriteNpy(out, arr.dtype, arr.shape, arr.data.data(), arr.data.size());
      printf("ok %lld elems\n", (long long)arr.elems());
      return 0;
    } else if (a == "--copt") {
      std::string kv = next();
      size_t eq = kv.find('=');
      if (eq == std::string::npos) Die("--copt wants k=v, got " + kv);
      copts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else {
      Die("unknown flag " + a);
    }
  }
  if (plugin.empty() || bundle.empty())
    Die("usage: pjrt_host --plugin SO --bundle DIR [--cube C --spectra S "
        "--out O] [--copt k=v ...] [--repeat N] [--serve]");

  void* h = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!h) Die(std::string("dlopen: ") + dlerror());
  auto get_api =
      reinterpret_cast<const PJRT_Api* (*)()>(dlsym(h, "GetPjrtApi"));
  if (!get_api) Die(std::string("dlsym GetPjrtApi: ") + dlerror());
  g_api = get_api();
  fprintf(stderr, "pjrt_host: plugin API %d.%d (host built against %d.%d)\n",
          g_api->pjrt_api_version.major_version,
          g_api->pjrt_api_version.minor_version, PJRT_API_MAJOR,
          PJRT_API_MINOR);

  INIT_ARGS(pi, PJRT_Plugin_Initialize_Args);
  CHECK_OK(g_api->PJRT_Plugin_Initialize(&pi));

  Host host;
  host.sig = ParseSignature(bundle + "/signature.txt");
  auto t0 = std::chrono::steady_clock::now();
  host.CreateClient(copts);
  double client_ms = std::chrono::duration<double, std::milli>(
                         std::chrono::steady_clock::now() - t0)
                         .count();
  t0 = std::chrono::steady_clock::now();
  host.Compile(ReadFile(bundle + "/module.stablehlo"),
               ReadFile(bundle + "/compile_options.pb"));
  double compile_ms = std::chrono::duration<double, std::milli>(
                          std::chrono::steady_clock::now() - t0)
                          .count();
  fprintf(stderr, "pjrt_host: client %.0f ms, compile %.0f ms\n", client_ms,
          compile_ms);

  if (serve) {
    std::string line;
    while (std::getline(std::cin, line)) {
      if (line.empty()) break;
      std::stringstream ss(line);
      std::string c, s, o;
      if (!(ss >> c >> s >> o)) {
        printf("error bad request (want: cube spectra out)\n");
        fflush(stdout);
        continue;
      }
      try {
        auto inputs = LoadInputs(host.sig, {c, s});
        double ms = RunOnce(host, inputs, o);
        printf("ok %s %.2f\n", o.c_str(), ms);
      } catch (const std::exception& e) {
        // responses are one line per request; XLA error strings can
        // span lines, so flatten before printing
        std::string msg = e.what();
        for (char& ch : msg)
          if (ch == '\n' || ch == '\r') ch = ' ';
        printf("error %s\n", msg.c_str());
      }
      fflush(stdout);
    }
    return 0;
  }

  if (!indir.empty()) {
    // generic N-ary mode (training bundles): signature-named .npy in,
    // every output written back out
    if (outdir.empty()) Die("--inputs needs --outdir");
    double best = 1e30, sum = 0;
    for (int r = 0; r < repeat; ++r) {
      double ms = RunGeneric(host, indir, outdir);
      best = best < ms ? best : ms;
      sum += ms;
    }
    printf(
        "{\"client_ms\": %.0f, \"compile_ms\": %.0f, \"run_ms_min\": "
        "%.2f, \"run_ms_mean\": %.2f, \"repeat\": %d, \"num_inputs\": "
        "%zu, \"num_outputs\": %zu}\n",
        client_ms, compile_ms, best, sum / repeat, repeat,
        host.sig.inputs.size(), host.sig.outputs.size());
    return 0;
  }

  if (cube.empty() || spectra.empty() || out_path.empty())
    Die("one-shot mode needs --cube, --spectra, --out "
        "(or --inputs DIR --outdir DIR)");
  auto inputs = LoadInputs(host.sig, {cube, spectra});
  double best = 1e30, sum = 0;
  for (int r = 0; r < repeat; ++r) {
    double ms = RunOnce(host, inputs, out_path);
    best = best < ms ? best : ms;
    sum += ms;
  }
  // One parseable result line on stdout.
  printf(
      "{\"client_ms\": %.0f, \"compile_ms\": %.0f, \"run_ms_min\": %.2f, "
      "\"run_ms_mean\": %.2f, \"repeat\": %d}\n",
      client_ms, compile_ms, best, sum / repeat, repeat);
  return 0;
}
