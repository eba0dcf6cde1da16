// Pure-C++ inference for spconv_tpu exported models via the PJRT C API.
//
// The counterpart of the reference's example/libspconv/main.cu:177-436
// (which drives libspconv's C++ ops with a StaticAllocator): here the
// whole sparse pipeline — rulebook build, convs, epilogues — was compiled
// into ONE static StableHLO program by export_model.py, and this loader
// runs it with no Python anywhere:
//
//   1. dlopen a PJRT plugin (.so exporting GetPjrtApi) — e.g. the local
//      TPU plugin (libtpu.so), a CPU plugin, or this environment's axon
//      tunnel plugin (/opt/axon/libaxon_pjrt.so)
//   2. PJRT_Client_Create
//   3. PJRT_Client_Compile(module.mlirbc, format="mlir")
//   4. PJRT_Client_BufferFromHostBuffer for each manifest input
//   5. PJRT_LoadedExecutable_Execute
//   6. PJRT_Buffer_ToHostBuffer, compare against the golden outputs
//
// Usage: pjrt_loader <plugin.so> <artifact_dir>
// Build: ./build.sh   (needs only g++, libdl and the single-header
//                      PJRT C API shipped in any tensorflow/jaxlib wheel)

#include <dlfcn.h>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

void CheckErr(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "FATAL %s: %.*s\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  std::exit(1);
}

void AwaitEvent(PJRT_Event* ev, const char* what) {
  if (ev == nullptr) return;
  PJRT_Event_Await_Args aargs;
  std::memset(&aargs, 0, sizeof(aargs));
  aargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aargs.event = ev;
  CheckErr(g_api->PJRT_Event_Await(&aargs), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = ev;
  CheckErr(g_api->PJRT_Event_Destroy(&dargs), "event destroy");
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "FATAL cannot read %s\n", path.c_str());
    std::exit(1);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

struct TensorSpec {
  bool is_input;
  PJRT_Buffer_Type type;   // f32 or s32
  size_t elem_size;
  std::vector<int64_t> dims;
  std::string file;
  size_t num_elems() const {
    size_t n = 1;
    for (int64_t d : dims) n *= static_cast<size_t>(d);
    return n;
  }
};

// Optional plugin create_options (PJRT create options are plugin-specific:
// libtpu / CPU plugins need none; managed plugins may require e.g. a
// topology or session id).  File format: one "name type value" per line,
// type in {str, i64}.  The test harness dumps the options the Python
// client was registered with.
struct NamedOption {
  std::string name;
  PJRT_NamedValue_Type type;
  std::string sval;
  int64_t ival;
};

std::vector<NamedOption> ParseOptions(const std::string& dir) {
  std::vector<NamedOption> opts;
  std::ifstream f(dir + "/plugin_options.txt");
  if (!f) return opts;
  std::string name, type;
  while (f >> name >> type) {
    NamedOption o;
    o.name = name;
    if (type == "str") {
      o.type = PJRT_NamedValue_kString;
      f >> o.sval;
    } else if (type == "i64") {
      o.type = PJRT_NamedValue_kInt64;
      f >> o.ival;
    } else {
      std::fprintf(stderr, "FATAL bad option type %s\n", type.c_str());
      std::exit(1);
    }
    opts.push_back(std::move(o));
  }
  return opts;
}

std::vector<TensorSpec> ParseManifest(const std::string& dir) {
  std::istringstream in(ReadFile(dir + "/manifest.txt"));
  std::vector<TensorSpec> specs;
  std::string kind, dtype, dims_s, file;
  while (in >> kind >> dtype >> dims_s >> file) {
    TensorSpec s;
    s.is_input = (kind == "input");
    if (dtype == "f32") {
      s.type = PJRT_Buffer_Type_F32;
      s.elem_size = 4;
    } else if (dtype == "s32") {
      s.type = PJRT_Buffer_Type_S32;
      s.elem_size = 4;
    } else {
      std::fprintf(stderr, "FATAL unknown dtype %s\n", dtype.c_str());
      std::exit(1);
    }
    std::istringstream ds(dims_s);
    std::string tok;
    while (std::getline(ds, tok, ',')) s.dims.push_back(std::stoll(tok));
    s.file = dir + "/" + file;
    specs.push_back(std::move(s));
  }
  return specs;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s <pjrt_plugin.so> <artifact_dir>\n",
                 argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  const std::string dir = argv[2];

  // 1. load the plugin ----------------------------------------------------
  void* lib = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (lib == nullptr) {
    std::fprintf(stderr, "FATAL dlopen(%s): %s\n", plugin_path, dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(lib, "GetPjrtApi"));
  if (get_api == nullptr) {
    std::fprintf(stderr, "FATAL %s does not export GetPjrtApi\n",
                 plugin_path);
    return 1;
  }
  g_api = get_api();
  std::printf("plugin PJRT API v%d.%d\n", g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args pinit;
  std::memset(&pinit, 0, sizeof(pinit));
  pinit.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  CheckErr(g_api->PJRT_Plugin_Initialize(&pinit), "plugin init");

  // 2. client -------------------------------------------------------------
  std::vector<NamedOption> opts = ParseOptions(dir);
  std::vector<PJRT_NamedValue> nvs(opts.size());
  for (size_t i = 0; i < opts.size(); ++i) {
    std::memset(&nvs[i], 0, sizeof(nvs[i]));
    nvs[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nvs[i].name = opts[i].name.c_str();
    nvs[i].name_size = opts[i].name.size();
    nvs[i].type = opts[i].type;
    if (opts[i].type == PJRT_NamedValue_kString) {
      nvs[i].string_value = opts[i].sval.c_str();
      nvs[i].value_size = opts[i].sval.size();
    } else {
      nvs[i].int64_value = opts[i].ival;
      nvs[i].value_size = 1;
    }
  }
  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = nvs.empty() ? nullptr : nvs.data();
  cargs.num_options = nvs.size();
  CheckErr(g_api->PJRT_Client_Create(&cargs), "client create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_PlatformName_Args pn;
  std::memset(&pn, 0, sizeof(pn));
  pn.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pn.client = client;
  CheckErr(g_api->PJRT_Client_PlatformName(&pn), "platform name");
  std::printf("platform: %.*s\n", static_cast<int>(pn.platform_name_size),
              pn.platform_name);

  PJRT_Client_AddressableDevices_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client;
  CheckErr(g_api->PJRT_Client_AddressableDevices(&dargs), "devices");
  if (dargs.num_addressable_devices == 0) {
    std::fprintf(stderr, "FATAL no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = dargs.addressable_devices[0];

  // 3. compile the StableHLO module ----------------------------------------
  const std::string module = ReadFile(dir + "/module.mlirbc");
  const std::string copts = ReadFile(dir + "/compile_options.pb");
  static const char kMlir[] = "mlir";
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(module.data());
  program.code_size = module.size();
  program.format = kMlir;
  program.format_size = sizeof(kMlir) - 1;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  CheckErr(g_api->PJRT_Client_Compile(&comp), "compile");
  PJRT_LoadedExecutable* exec = comp.executable;
  std::printf("compiled %zu B StableHLO\n", module.size());

  // 4. host → device transfers ---------------------------------------------
  std::vector<TensorSpec> specs = ParseManifest(dir);
  std::vector<PJRT_Buffer*> inputs;
  std::vector<std::string> input_data;  // keep host buffers alive
  std::vector<TensorSpec> outputs;
  for (const TensorSpec& s : specs) {
    if (!s.is_input) {
      outputs.push_back(s);
      continue;
    }
    input_data.push_back(ReadFile(s.file));
    const std::string& data = input_data.back();
    if (data.size() != s.num_elems() * s.elem_size) {
      std::fprintf(stderr, "FATAL %s: size %zu != expected %zu\n",
                   s.file.c_str(), data.size(),
                   s.num_elems() * s.elem_size);
      return 1;
    }
    PJRT_Client_BufferFromHostBuffer_Args b;
    std::memset(&b, 0, sizeof(b));
    b.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    b.client = client;
    b.data = data.data();
    b.type = s.type;
    b.dims = s.dims.data();
    b.num_dims = s.dims.size();
    b.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    b.device = device;
    CheckErr(g_api->PJRT_Client_BufferFromHostBuffer(&b), "h2d");
    AwaitEvent(b.done_with_host_buffer, "h2d done");
    inputs.push_back(b.buffer);
  }
  std::printf("%zu inputs transferred\n", inputs.size());

  // 5. execute --------------------------------------------------------------
  PJRT_LoadedExecutable_GetExecutable_Args ge;
  std::memset(&ge, 0, sizeof(ge));
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  CheckErr(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "get exec");
  PJRT_Executable_NumOutputs_Args no;
  std::memset(&no, 0, sizeof(no));
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  CheckErr(g_api->PJRT_Executable_NumOutputs(&no), "num outputs");
  const size_t num_outputs = no.num_outputs;
  if (num_outputs != outputs.size()) {
    std::fprintf(stderr, "FATAL executable outputs %zu != manifest %zu\n",
                 num_outputs, outputs.size());
    return 1;
  }

  PJRT_ExecuteOptions eopts;
  std::memset(&eopts, 0, sizeof(eopts));
  eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* const* arg_list = inputs.data();
  std::vector<PJRT_Buffer*> out_bufs(num_outputs, nullptr);
  PJRT_Buffer** out_list = out_bufs.data();
  PJRT_Event* done = nullptr;

  PJRT_LoadedExecutable_Execute_Args ex;
  std::memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exec;
  ex.options = &eopts;
  ex.argument_lists = &arg_list;
  ex.num_devices = 1;
  ex.num_args = inputs.size();
  ex.output_lists = &out_list;
  ex.device_complete_events = &done;
  ex.execute_device = device;
  CheckErr(g_api->PJRT_LoadedExecutable_Execute(&ex), "execute");
  AwaitEvent(done, "execute done");
  std::printf("executed\n");

  // 6. device → host + golden check -----------------------------------------
  bool ok = true;
  for (size_t oi = 0; oi < num_outputs; ++oi) {
    const TensorSpec& s = outputs[oi];
    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = out_bufs[oi];
    CheckErr(g_api->PJRT_Buffer_ToHostBuffer(&th), "d2h size");
    std::vector<char> host(th.dst_size);
    th.dst = host.data();
    CheckErr(g_api->PJRT_Buffer_ToHostBuffer(&th), "d2h");
    AwaitEvent(th.event, "d2h done");

    const std::string golden = ReadFile(s.file);
    if (golden.size() != host.size()) {
      std::fprintf(stderr, "output %zu: size %zu != golden %zu\n", oi,
                   host.size(), golden.size());
      ok = false;
      continue;
    }
    const size_t n = s.num_elems();
    if (s.type == PJRT_Buffer_Type_F32) {
      const float* a = reinterpret_cast<const float*>(host.data());
      const float* b = reinterpret_cast<const float*>(golden.data());
      double sum_abs_diff = 0, sum_abs = 0;
      for (size_t i = 0; i < n; ++i) {
        sum_abs_diff += std::fabs(static_cast<double>(a[i]) - b[i]);
        sum_abs += std::fabs(static_cast<double>(b[i]));
      }
      const double rel = sum_abs_diff / (sum_abs + 1e-9);
      std::printf("output %zu (f32, %zu elems): mean rel err %.3e\n", oi, n,
                  rel);
      // TPU f32 matmuls accumulate at bf16-ish precision; CPU goldens
      // agree to ~1e-2 mean-relative (see .claude/skills/verify gotchas)
      if (rel > 2e-2) ok = false;
    } else {
      const int32_t* a = reinterpret_cast<const int32_t*>(host.data());
      const int32_t* b = reinterpret_cast<const int32_t*>(golden.data());
      size_t mism = 0;
      for (size_t i = 0; i < n; ++i) mism += (a[i] != b[i]);
      std::printf("output %zu (s32, %zu elems): %zu mismatches\n", oi, n,
                  mism);
      if (mism != 0) ok = false;  // active-site SET must match exactly
    }
  }
  std::printf(ok ? "PJRT_LOADER_OK\n" : "PJRT_LOADER_MISMATCH\n");
  return ok ? 0 : 1;
}
