// Shim for hwy/profiler.h (absent from the TF-vendored Highway headers).
// The reference guards all profiler use behind these macros; upstream
// Highway compiles them to nothing when PROFILER_ENABLED == 0, which is
// the default for standalone builds.  This shim IS that disabled
// configuration: no-op macros + just enough type surface to typecheck.
// No timing or format logic lives here, so parity results are unaffected.
#ifndef REF_PARITY_PROFILER_SHIM_H_
#define REF_PARITY_PROFILER_SHIM_H_

#include <stddef.h>
#include <stdint.h>

#define PROFILER_ENABLED 0

namespace hwy {
namespace profiler {
using ZoneHandle = uint32_t;
}  // namespace profiler

class Profiler {
 public:
  static Profiler& Get() {
    static Profiler p;
    return p;
  }
  profiler::ZoneHandle AddZone(const char* /*name*/) { return 0; }
  void PrintResults() {}
};

}  // namespace hwy

// The disabled-profiler macro set (textually discards its arguments, like
// upstream's PROFILER_ENABLED == 0 branch).
#define PROFILER_ZONE(name)
#define PROFILER_ZONE2(profiler, thread, name)
#define PROFILER_ZONE3(profiler, thread, zone)
#define PROFILER_FUNC
#define PROFILER_PRINT_RESULTS()

#endif  // REF_PARITY_PROFILER_SHIM_H_
