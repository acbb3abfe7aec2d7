// Loopback PJRT plugin — hermetic CI double for pjrt_host.cc.
//
// No real PJRT plugin is loadable on the CPU CI image (libtpu needs a
// local chip; the tunnel plugin needs the remote terminal), so this stub
// implements the minimal PJRT C-API surface the host exercises —
// client create, compile, buffer upload, execute, fetch — with a fixed
// echo contract: executing any "program" copies input buffer 0 into
// output 0.  tests/test_native_host.py builds it with g++, points the
// REAL host binary at it, and asserts the served .npy equals the input:
// that pins every line of the host's PJRT plumbing (dlopen handshake,
// struct_size conventions, event lifecycle, two-phase ToHostBuffer)
// without hardware.  Numerics are pinned separately on hardware by
// scripts/native_serve_ab.py.
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

// ------------------------------------------------------------ fake types
struct PjrtErrorImpl {
  std::string message;
};

struct BufferImpl {
  std::vector<char> data;
  PJRT_Buffer_Type type;
  std::vector<int64_t> dims;
};

// Opaque singletons for client/device/executable/event: the host only
// passes these pointers back to us, so any non-null distinct values do.
int g_client_tag, g_device_tag, g_exec_tag, g_event_tag;

PJRT_Error* Ok() { return nullptr; }

PJRT_Error* Err(const std::string& msg) {
  return reinterpret_cast<PJRT_Error*>(new PjrtErrorImpl{msg});
}

size_t ElemSize(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32:
    case PJRT_Buffer_Type_S32:
    case PJRT_Buffer_Type_U32:
      return 4;
    case PJRT_Buffer_Type_BF16:
    case PJRT_Buffer_Type_F16:
      return 2;
    case PJRT_Buffer_Type_U8:
    case PJRT_Buffer_Type_S8:
      return 1;
    default:
      return 4;
  }
}

// ------------------------------------------------------------ api impls
void ErrorDestroy(PJRT_Error_Destroy_Args* args) {
  delete reinterpret_cast<PjrtErrorImpl*>(args->error);
}

void ErrorMessage(PJRT_Error_Message_Args* args) {
  auto* e = reinterpret_cast<PjrtErrorImpl*>(
      const_cast<PJRT_Error*>(args->error));
  args->message = e->message.c_str();
  args->message_size = e->message.size();
}

PJRT_Error* ErrorGetCode(PJRT_Error_GetCode_Args* args) {
  args->code = PJRT_Error_Code_INTERNAL;
  return Ok();
}

PJRT_Error* PluginInitialize(PJRT_Plugin_Initialize_Args*) { return Ok(); }

PJRT_Error* EventDestroy(PJRT_Event_Destroy_Args*) { return Ok(); }

PJRT_Error* EventAwait(PJRT_Event_Await_Args*) { return Ok(); }

PJRT_Error* ClientCreate(PJRT_Client_Create_Args* args) {
  args->client = reinterpret_cast<PJRT_Client*>(&g_client_tag);
  return Ok();
}

PJRT_Error* ClientDestroy(PJRT_Client_Destroy_Args*) { return Ok(); }

PJRT_Error* ClientPlatformName(PJRT_Client_PlatformName_Args* args) {
  static const char kName[] = "cmlpl-stub";
  args->platform_name = kName;
  args->platform_name_size = sizeof(kName) - 1;
  return Ok();
}

PJRT_Error* ClientDevices(PJRT_Client_Devices_Args* args) {
  static PJRT_Device* dev = reinterpret_cast<PJRT_Device*>(&g_device_tag);
  args->devices = &dev;
  args->num_devices = 1;
  return Ok();
}

PJRT_Error* ClientAddressableDevices(
    PJRT_Client_AddressableDevices_Args* args) {
  static PJRT_Device* dev = reinterpret_cast<PJRT_Device*>(&g_device_tag);
  args->addressable_devices = &dev;
  args->num_addressable_devices = 1;
  return Ok();
}

PJRT_Error* ClientCompile(PJRT_Client_Compile_Args* args) {
  if (args->program == nullptr || args->program->code_size == 0)
    return Err("stub: empty program");
  args->executable =
      reinterpret_cast<PJRT_LoadedExecutable*>(&g_exec_tag);
  return Ok();
}

PJRT_Error* BufferFromHostBuffer(
    PJRT_Client_BufferFromHostBuffer_Args* args) {
  auto* b = new BufferImpl;
  b->type = args->type;
  b->dims.assign(args->dims, args->dims + args->num_dims);
  int64_t n = 1;
  for (int64_t d : b->dims) n *= d;
  size_t bytes = static_cast<size_t>(n) * ElemSize(args->type);
  b->data.resize(bytes);
  memcpy(b->data.data(), args->data, bytes);
  args->buffer = reinterpret_cast<PJRT_Buffer*>(b);
  args->done_with_host_buffer =
      reinterpret_cast<PJRT_Event*>(&g_event_tag);
  return Ok();
}

PJRT_Error* BufferDestroy(PJRT_Buffer_Destroy_Args* args) {
  delete reinterpret_cast<BufferImpl*>(args->buffer);
  return Ok();
}

PJRT_Error* BufferToHostBuffer(PJRT_Buffer_ToHostBuffer_Args* args) {
  auto* b = reinterpret_cast<BufferImpl*>(args->src);
  if (args->dst == nullptr) {  // size-query phase
    args->dst_size = b->data.size();
    return Ok();
  }
  if (args->dst_size < b->data.size()) return Err("stub: dst too small");
  memcpy(args->dst, b->data.data(), b->data.size());
  args->event = reinterpret_cast<PJRT_Event*>(&g_event_tag);
  return Ok();
}

// Byte size of one element of a signature dtype token.
size_t SigDtypeSize(const std::string& d) {
  if (d == "bf16") return 2;
  if (d == "u8") return 1;
  return 4;  // f32 / i32 / u32
}

// Output shapes for multi-output programs: parsed from the bundle's
// signature.txt when CMLPL_STUB_SIGNATURE points at it (the Execute
// args carry no output count/shape — real plugins know them from the
// compiled program; the stub compiles nothing).
struct OutSpec {
  std::vector<int64_t> dims;
  size_t bytes;
};

std::vector<OutSpec> ParseOutSpecs(const char* path) {
  std::vector<OutSpec> outs;
  FILE* f = fopen(path, "r");
  if (!f) return outs;
  char kind[32], name[256], dtype[16], dims[256];
  while (fscanf(f, "%31s %255s %15s %255s", kind, name, dtype, dims) == 4) {
    if (std::string(kind) != "output") continue;
    OutSpec s;
    int64_t n = 1;
    if (std::string(dims) != "-") {
      std::string tok;
      for (const char* p = dims;; ++p) {
        if (*p == ',' || *p == '\0') {
          if (!tok.empty()) {
            s.dims.push_back(std::stoll(tok));
            n *= s.dims.back();
          }
          tok.clear();
          if (*p == '\0') break;
        } else {
          tok += *p;
        }
      }
    }
    s.bytes = static_cast<size_t>(n) * SigDtypeSize(dtype);
    outs.push_back(s);
  }
  fclose(f);
  return outs;
}

// Echo contract: without CMLPL_STUB_SIGNATURE, output 0 := copy of
// input 0 (the 1-output inference-bundle contract).  With it, every
// signature output i is fabricated at its true byte size: zero-filled,
// prefixed with input (i % num_args)'s bytes — deterministic, so the
// Python side can assert it.  Enough to drive every host code path;
// real numerics are the hardware A/B's job.
PJRT_Error* ExecutableExecute(PJRT_LoadedExecutable_Execute_Args* args) {
  if (args->num_devices != 1) return Err("stub: single device only");
  if (args->num_args < 1) return Err("stub: needs >=1 arg");
  std::vector<OutSpec> specs;
  if (const char* env = getenv("CMLPL_STUB_SIGNATURE"))
    specs = ParseOutSpecs(env);
  if (specs.empty()) {
    auto* in0 = reinterpret_cast<BufferImpl*>(args->argument_lists[0][0]);
    args->output_lists[0][0] =
        reinterpret_cast<PJRT_Buffer*>(new BufferImpl(*in0));
  } else {
    for (size_t i = 0; i < specs.size(); ++i) {
      auto* src = reinterpret_cast<BufferImpl*>(
          args->argument_lists[0][i % args->num_args]);
      auto* out = new BufferImpl;
      out->type = src->type;
      out->dims = specs[i].dims;
      out->data.assign(specs[i].bytes, 0);
      size_t n = src->data.size() < specs[i].bytes ? src->data.size()
                                                   : specs[i].bytes;
      memcpy(out->data.data(), src->data.data(), n);
      args->output_lists[0][i] = reinterpret_cast<PJRT_Buffer*>(out);
    }
  }
  if (args->device_complete_events != nullptr)
    args->device_complete_events[0] =
        reinterpret_cast<PJRT_Event*>(&g_event_tag);
  return Ok();
}

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() {
  static PJRT_Api api = [] {
    PJRT_Api a;
    memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Api_STRUCT_SIZE;
    a.pjrt_api_version.major_version = PJRT_API_MAJOR;
    a.pjrt_api_version.minor_version = PJRT_API_MINOR;
    a.PJRT_Error_Destroy = ErrorDestroy;
    a.PJRT_Error_Message = ErrorMessage;
    a.PJRT_Error_GetCode = ErrorGetCode;
    a.PJRT_Plugin_Initialize = PluginInitialize;
    a.PJRT_Event_Destroy = EventDestroy;
    a.PJRT_Event_Await = EventAwait;
    a.PJRT_Client_Create = ClientCreate;
    a.PJRT_Client_Destroy = ClientDestroy;
    a.PJRT_Client_PlatformName = ClientPlatformName;
    a.PJRT_Client_Devices = ClientDevices;
    a.PJRT_Client_AddressableDevices = ClientAddressableDevices;
    a.PJRT_Client_Compile = ClientCompile;
    a.PJRT_Client_BufferFromHostBuffer = BufferFromHostBuffer;
    a.PJRT_Buffer_Destroy = BufferDestroy;
    a.PJRT_Buffer_ToHostBuffer = BufferToHostBuffer;
    a.PJRT_LoadedExecutable_Execute = ExecutableExecute;
    return a;
  }();
  return &api;
}
