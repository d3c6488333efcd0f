/* Example C plugin (reference ext/example analogue): build with
 *   cc -shared -fPIC -O2 example_plugin.c -o example_plugin.so
 * then
 *   (loadfn "native/example_plugin.so" 'rf_vsum 1)
 *   (loadfn "native/example_plugin.so" 'rf_saxpy 3)
 */
#include <stdlib.h>
#include <string.h>
#include "rayforce_plugin.h"

/* (rf_vsum v): sum of an I64 vector -> I64 atom */
int rf_vsum(const rf_vec *args, int32_t nargs, rf_vec *out)
{
    if (nargs != 1 || args[0].type != RF_I64 || args[0].len < 0)
        return 1;
    const int64_t *a = (const int64_t *)args[0].data;
    int64_t s = 0;
    for (int64_t i = 0; i < args[0].len; i++)
        s += a[i];
    int64_t *r = malloc(sizeof(int64_t));
    *r = s;
    out->type = RF_I64;
    out->len = -1;
    out->data = r;
    return 0;
}

/* (rf_saxpy a x y): a*x + y elementwise over F64 vectors */
int rf_saxpy(const rf_vec *args, int32_t nargs, rf_vec *out)
{
    if (nargs != 3 || args[0].len != -1 || args[0].type != RF_F64 ||
        args[1].type != RF_F64 || args[2].type != RF_F64 ||
        args[1].len != args[2].len || args[1].len < 0)
        return 1;
    double a = *(const double *)args[0].data;
    const double *x = (const double *)args[1].data;
    const double *y = (const double *)args[2].data;
    int64_t n = args[1].len;
    double *r = malloc((size_t)n * sizeof(double));
    for (int64_t i = 0; i < n; i++)
        r[i] = a * x[i] + y[i];
    out->type = RF_F64;
    out->len = n;
    out->data = r;
    return 0;
}
