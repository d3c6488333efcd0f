// rayforce-tpu native runtime: multithreaded typed CSV parsing.
//
// The reference parses CSV in parallel by line ranges over its pinned
// thread pool (core/io.c:535-632: one pass builds a line index, then
// workers parse disjoint ranges into preallocated columns). This is
// the same design as a C++ shared library driven through ctypes:
// callers pass the mmap'd file bytes and preallocated numpy buffers;
// every exported function chunks rows across std::thread workers.
//
// Exported C ABI (see storage/native.py for the Python bindings):
//   rf_count_lines      newline count (parallel)
//   rf_index_lines      line-start offsets
//   rf_parse_i64/f64    typed column parse with empty->null
//   rf_parse_date/time/timestamp
//   rf_field_spans      per-row (offset, length) of one column
//   rf_fill_fixed       copy one column's bytes into a fixed-width
//                       padded matrix (for vectorized symbol interning)
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

unsigned n_workers() {
    unsigned n = std::thread::hardware_concurrency();
    return n ? std::min(n, 16u) : 4u;
}

template <typename F>
void parallel_rows(int64_t n, F fn) {
    unsigned nw = n_workers();
    if (n < 4096 || nw <= 1) { fn((int64_t)0, n); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nw - 1) / nw;
    for (unsigned w = 0; w < nw; w++) {
        int64_t lo = (int64_t)w * chunk;
        int64_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] { fn(lo, hi); });
    }
    for (auto &t : ts) t.join();
}

// locate column `col` within line [p, end); returns [fs, fe)
inline bool find_field(const char *p, const char *end, int col,
                       char sep, const char **fs, const char **fe) {
    for (int c = 0; c < col; c++) {
        const char *q = (const char *)memchr(p, sep, end - p);
        if (!q) return false;
        p = q + 1;
    }
    const char *q = (const char *)memchr(p, sep, end - p);
    *fs = p;
    *fe = q ? q : end;
    return true;
}

inline const char *line_end(const char *buf, int64_t buflen,
                            int64_t start) {
    const char *p = buf + start;
    const char *q = (const char *)memchr(p, '\n', buflen - start);
    const char *e = q ? q : buf + buflen;
    if (e > p && e[-1] == '\r') e--;
    return e;
}

inline int64_t parse_int(const char *p, const char *e, bool *ok) {
    *ok = false;
    if (p >= e) return 0;
    bool neg = false;
    if (*p == '-' || *p == '+') { neg = *p == '-'; p++; }
    if (p >= e) return 0;
    int64_t v = 0;
    for (; p < e; p++) {
        if (*p < '0' || *p > '9') return 0;
        v = v * 10 + (*p - '0');
    }
    *ok = true;
    return neg ? -v : v;
}

inline double parse_f64(const char *p, const char *e, bool *ok) {
    char tmp[64];
    size_t n = (size_t)(e - p);
    if (n == 0 || n >= sizeof(tmp)) { *ok = false; return 0.0; }
    memcpy(tmp, p, n);
    tmp[n] = 0;
    char *endp = nullptr;
    double v = strtod(tmp, &endp);
    *ok = endp == tmp + n;
    return v;
}

// days from civil date (Howard Hinnant's algorithm; matches
// core/date.c and core/temporal.py: epoch 2000.01.01)
inline int64_t days_from_civil(int64_t y, int64_t m, int64_t d) {
    y -= m <= 2;
    int64_t era = (y >= 0 ? y : y - 399) / 400;
    int64_t yoe = y - era * 400;
    int64_t doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
    int64_t doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
    return era * 146097 + doe - 719468 - 10957;  // epoch 2000.01.01
}

}  // namespace

extern "C" {

int64_t rf_count_lines(const char *buf, int64_t n) {
    std::vector<int64_t> parts(n_workers() + 1, 0);
    unsigned nw = n_workers();
    int64_t chunk = (n + nw - 1) / nw;
    std::vector<std::thread> ts;
    for (unsigned w = 0; w < nw; w++) {
        int64_t lo = (int64_t)w * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([&, w, lo, hi] {
            int64_t c = 0;
            const char *p = buf + lo, *e = buf + hi;
            while ((p = (const char *)memchr(p, '\n', e - p))) {
                c++; p++;
            }
            parts[w] = c;
        });
    }
    for (auto &t : ts) t.join();
    int64_t total = 0;
    for (auto c : parts) total += c;
    if (n > 0 && buf[n - 1] != '\n') total++;  // last line unterminated
    return total;
}

// line start offsets; returns number written (<= max_lines)
int64_t rf_index_lines(const char *buf, int64_t n, int64_t *starts,
                       int64_t max_lines) {
    int64_t cnt = 0;
    if (n > 0 && cnt < max_lines) starts[cnt++] = 0;
    const char *p = buf, *e = buf + n;
    while (cnt < max_lines &&
           (p = (const char *)memchr(p, '\n', e - p))) {
        p++;
        if (p >= e) break;
        starts[cnt++] = p - buf;
    }
    return cnt;
}

void rf_parse_i64(const char *buf, int64_t buflen,
                  const int64_t *starts, int64_t nrows, int col,
                  char sep, int64_t *out, int64_t nullv) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            bool ok = find_field(buf + starts[i], le, col, sep,
                                 &fs, &fe) && fs < fe;
            bool pok = false;
            int64_t v = ok ? parse_int(fs, fe, &pok) : 0;
            out[i] = pok ? v : nullv;
        }
    });
}

void rf_parse_f64(const char *buf, int64_t buflen,
                  const int64_t *starts, int64_t nrows, int col,
                  char sep, double *out) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            bool ok = find_field(buf + starts[i], le, col, sep,
                                 &fs, &fe) && fs < fe;
            bool pok = false;
            double v = ok ? parse_f64(fs, fe, &pok) : 0.0;
            out[i] = pok ? v : NAN;
        }
    });
}

// dates like 2024.01.31 or 2024-01-31 -> days since 2000.01.01
void rf_parse_date(const char *buf, int64_t buflen,
                   const int64_t *starts, int64_t nrows, int col,
                   char sep, int32_t *out, int32_t nullv) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            out[i] = nullv;
            if (!find_field(buf + starts[i], le, col, sep, &fs, &fe)
                || fe - fs < 8)
                continue;
            int64_t y = 0, m = 0, d = 0, part = 0, vals[3] = {0, 0, 0};
            bool bad = false;
            for (const char *p = fs; p < fe; p++) {
                if (*p == '.' || *p == '-' || *p == '/') {
                    if (++part > 2) { bad = true; break; }
                } else if (*p >= '0' && *p <= '9') {
                    vals[part] = vals[part] * 10 + (*p - '0');
                } else { bad = true; break; }
            }
            if (bad || part != 2) continue;
            y = vals[0]; m = vals[1]; d = vals[2];
            out[i] = (int32_t)days_from_civil(y, m, d);
        }
    });
}

// HH:MM:SS[.mmm] -> milliseconds
void rf_parse_time(const char *buf, int64_t buflen,
                   const int64_t *starts, int64_t nrows, int col,
                   char sep, int32_t *out, int32_t nullv) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            out[i] = nullv;
            if (!find_field(buf + starts[i], le, col, sep, &fs, &fe)
                || fe - fs < 5)
                continue;
            int64_t parts[4] = {0, 0, 0, 0};
            int pi = 0;
            bool bad = false;
            for (const char *p = fs; p < fe; p++) {
                if (*p == ':') { if (++pi > 2) { bad = true; break; } }
                else if (*p == '.' && pi == 2) pi = 3;
                else if (*p >= '0' && *p <= '9')
                    parts[pi] = parts[pi] * 10 + (*p - '0');
                else { bad = true; break; }
            }
            if (bad || pi < 2) continue;
            out[i] = (int32_t)(parts[0] * 3600000 + parts[1] * 60000 +
                               parts[2] * 1000 + parts[3]);
        }
    });
}

// YYYY.MM.DD[D|T]HH:MM:SS[.nnnnnnnnn] -> ns since 2000.01.01
void rf_parse_timestamp(const char *buf, int64_t buflen,
                        const int64_t *starts, int64_t nrows, int col,
                        char sep, int64_t *out, int64_t nullv) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            out[i] = nullv;
            if (!find_field(buf + starts[i], le, col, sep, &fs, &fe)
                || fs >= fe)
                continue;
            // plain integer nanoseconds (the host parser's format)
            bool iok = false;
            int64_t iv = parse_int(fs, fe, &iok);
            if (iok) { out[i] = iv; continue; }
            if (fe - fs < 10) continue;
            // split date / time on 'D' or 'T' or ' '
            const char *mid = fs;
            while (mid < fe && *mid != 'D' && *mid != 'T' &&
                   *mid != ' ')
                mid++;
            int64_t vals[3] = {0, 0, 0};
            int part = 0;
            bool bad = false;
            for (const char *p = fs; p < mid; p++) {
                if (*p == '.' || *p == '-') {
                    if (++part > 2) { bad = true; break; }
                } else if (*p >= '0' && *p <= '9')
                    vals[part] = vals[part] * 10 + (*p - '0');
                else { bad = true; break; }
            }
            if (bad || part != 2) continue;
            int64_t days =
                days_from_civil(vals[0], vals[1], vals[2]);
            int64_t ns = 0;
            if (mid < fe) {
                int64_t t[3] = {0, 0, 0};
                int64_t frac = 0;
                int fdig = 0, pi = 0;
                bool infrac = false;
                for (const char *p = mid + 1; p < fe; p++) {
                    if (*p == ':') { if (++pi > 2) break; }
                    else if (*p == '.' && pi == 2) infrac = true;
                    else if (*p >= '0' && *p <= '9') {
                        if (infrac) { frac = frac * 10 + (*p - '0');
                                      fdig++; }
                        else t[pi] = t[pi] * 10 + (*p - '0');
                    }
                }
                for (; fdig < 9; fdig++) frac *= 10;
                ns = ((t[0] * 3600 + t[1] * 60 + t[2]) * 1000000000LL)
                     + frac;
            }
            out[i] = days * 86400000000000LL + ns;
        }
    });
}

// (offset, length) of column `col` per row — for strings/symbols
void rf_field_spans(const char *buf, int64_t buflen,
                    const int64_t *starts, int64_t nrows, int col,
                    char sep, int64_t *off, int32_t *len) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            if (find_field(buf + starts[i], le, col, sep, &fs, &fe)) {
                off[i] = fs - buf;
                len[i] = (int32_t)(fe - fs);
            } else {
                off[i] = 0;
                len[i] = 0;
            }
        }
    });
}

// fixed-width padded copy (rows x width, NUL-padded) for vectorized
// unique+intern of symbol columns
void rf_fill_fixed(const char *buf, const int64_t *off,
                   const int32_t *len, int64_t nrows, int32_t width,
                   char *out) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        memset(out + lo * width, 0, (size_t)(hi - lo) * width);
        for (int64_t i = lo; i < hi; i++) {
            int32_t l = std::min(len[i], width);
            if (l > 0) memcpy(out + i * width, buf + off[i], l);
        }
    });
}

int32_t rf_max_len(const int32_t *len, int64_t nrows) {
    int32_t m = 0;
    for (int64_t i = 0; i < nrows; i++) m = std::max(m, len[i]);
    return m;
}

}  // extern "C"
