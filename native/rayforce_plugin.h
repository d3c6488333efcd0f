/* rayforce-tpu C plugin ABI (the analogue of the reference's dynlib
 * plugin surface, core/dynlib.c:191 + rayforce.syms: plugins export
 * `obj_p f(obj_p, ...)` against the engine's object model).
 *
 * Here the boundary is a flat vector view, loaded via ctypes:
 *
 *   typedef struct {
 *       int8_t   type;   // rayforce type code (2=U8, 3=I16, 4=I32,
 *                        // 5=I64, 10=F64, ... core/types.py); atoms
 *                        // use the same code with len == -1
 *       int64_t  len;    // element count, or -1 for an atom
 *       void    *data;   // caller-owned for inputs; malloc'd by the
 *                        // plugin for outputs (host copies + free()s)
 *   } rf_vec;
 *
 * A plugin function has the signature
 *
 *   int f(const rf_vec *args, int32_t nargs, rf_vec *out);
 *
 * returning 0 on success, nonzero -> raised as a Rayfall 'user error.
 * The host passes numpy-backed buffers for inputs (do not mutate) and
 * copies `out` into an engine vector before calling free(out->data).
 *
 * Build: cc -shared -fPIC -O2 myplugin.c -o myplugin.so
 * Load:  (loadfn "myplugin.so" 'f 1)
 */
#ifndef RAYFORCE_PLUGIN_H
#define RAYFORCE_PLUGIN_H

#include <stdint.h>

typedef struct {
    int8_t   type;
    int64_t  len;
    void    *data;
} rf_vec;

#define RF_U8   2
#define RF_I16  3
#define RF_I32  4
#define RF_I64  5
#define RF_F64  10

#endif
