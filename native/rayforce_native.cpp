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

// Quote-aware field walk (reference parse_csv_line, io.c:473-532): a
// field STARTING with '"' runs to the next '"' (no doubled-quote
// escapes), then quote+separator are skipped unverified (the
// reference's pos += 2). Returns 1 = field found ([fs,fe) and *quoted
// set), 0 = line exhausted before column `col`, -1 = unterminated
// quote (err_length in the reference).
inline int find_field(const char *p, const char *end, int col,
                      char sep, const char **fs, const char **fe,
                      bool *quoted) {
    for (int c = 0; ; c++) {
        if (p > end) return 0;
        bool q = p < end && *p == '"';
        const char *s, *e2;
        if (q) {
            const char *cq =
                (const char *)memchr(p + 1, '"', end - p - 1);
            if (!cq) return -1;
            s = p + 1;
            e2 = cq;
            p = cq + 2;
        } else {
            s = p;
            const char *sp = (const char *)memchr(p, sep, end - p);
            e2 = sp ? sp : end;
            p = e2 + 1;
        }
        if (c == col) {
            *fs = s;
            *fe = e2;
            *quoted = q;
            return 1;
        }
    }
}

// A field is MISSING (typed null) only when the line is exhausted or
// an unquoted field starts at line end; a quoted empty field is a
// real zero-length span (parses as 0).
inline bool field_at(const char *p, const char *end, int col, char sep,
                     const char **fs, const char **fe) {
    bool q = false;
    int st = find_field(p, end, col, sep, fs, fe, &q);
    return st == 1 && (q || *fs < end);
}

inline const char *line_end(const char *buf, int64_t buflen,
                            int64_t start) {
    const char *p = buf + start;
    const char *q = (const char *)memchr(p, '\n', buflen - start);
    const char *e = q ? q : buf + buflen;
    if (e > p && e[-1] == '\r') e--;
    return e;
}

// Prefix semantics of the reference's i64_from_str (string.c): skip
// whitespace, accept '-' ONLY (no '+'), then the digit run; anything
// after is ignored and a field with no digits reads as 0.
inline int64_t parse_int(const char *p, const char *e, bool * /*ok*/) {
    while (p < e && (*p == ' ' || *p == '\t' || *p == '\r' ||
                     *p == '\n')) p++;
    bool neg = false;
    if (p < e && *p == '-') { neg = true; p++; }
    int64_t v = 0;
    for (; p < e && *p >= '0' && *p <= '9'; p++)
        v = v * 10 + (*p - '0');
    return neg ? -v : v;
}

// Reference f64_from_str (string.c:273): [ws][-]digits[.digits]
// [eE[+-]digits]; no inf/nan/hex forms — a non-numeric prefix is 0.0.
inline double parse_f64(const char *p, const char *e, bool * /*ok*/) {
    while (p < e && (*p == ' ' || *p == '\t' || *p == '\r' ||
                     *p == '\n')) p++;
    double sign = 1.0;
    if (p < e && *p == '-') { sign = -1.0; p++; }
    double ip = 0.0;
    while (p < e && *p >= '0' && *p <= '9')
        ip = ip * 10 + (*p++ - '0');
    if (p < e && *p == '.') {
        p++;
        double frac = 0.0, div = 1.0;
        while (p < e && *p >= '0' && *p <= '9') {
            frac = frac * 10 + (*p++ - '0');
            div *= 10.0;
        }
        ip += frac / div;
    }
    if (p < e && (*p == 'e' || *p == 'E')) {
        p++;
        int es = 1;
        if (p < e && (*p == '-' || *p == '+')) {
            if (*p == '-') es = -1;
            p++;
        }
        const char *d0 = p;
        int64_t ex = 0;
        while (p < e && *p >= '0' && *p <= '9')
            ex = ex * 10 + (*p++ - '0');
        if (p > d0) {
            double m = 1.0;
            for (int64_t j = 0; j < ex; j++)
                m = es > 0 ? m * 10.0 : m / 10.0;
            ip *= m;
        }
    }
    return sign * ip;
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

// Null rule (reference parse_csv_line, io.c:473-532): a field is a
// typed NULL only when it STARTS at line end (missing / empty last
// field); an empty field followed by a separator parses as 0.
void rf_parse_i64(const char *buf, int64_t buflen,
                  const int64_t *starts, int64_t nrows, int col,
                  char sep, int64_t *out, int64_t nullv) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            bool ok = field_at(buf + starts[i], le, col, sep, &fs, &fe);
            out[i] = ok ? parse_int(fs, fe, nullptr) : nullv;
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
            bool ok = field_at(buf + starts[i], le, col, sep, &fs, &fe);
            out[i] = ok ? parse_f64(fs, fe, nullptr) : NAN;
        }
    });
}

// b8_from_str (reference string.c:108): "true"/"True"/"TRUE" prefix
// is true, everything else — including a missing field — is false.
void rf_parse_b8(const char *buf, int64_t buflen,
                 const int64_t *starts, int64_t nrows, int col,
                 char sep, int8_t *out) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            int8_t v = 0;
            if (field_at(buf + starts[i], le, col, sep, &fs, &fe)
                && fe - fs >= 4 &&
                (memcmp(fs, "true", 4) == 0 ||
                 memcmp(fs, "True", 4) == 0 ||
                 memcmp(fs, "TRUE", 4) == 0))
                v = 1;
            out[i] = v;
        }
    });
}

// dates like 2024.01.31 or 2024-01-31 -> days since 2000.01.01
// Reference date_from_str (date.c): three digit runs separated by
// ANY non-digit runs; year wraps u16, month 1-12, day 1-31.
inline bool date_runs(const char *p, const char *e, int64_t *vals,
                      int need) {
    int cnt = 0;
    while (p < e && cnt < need) {
        int64_t v = 0;
        const char *d0 = p;
        while (p < e && *p >= '0' && *p <= '9')
            v = v * 10 + (*p++ - '0');
        if (p == d0) return false;   // no digits where a run is due
        vals[cnt++] = v;
        while (p < e && (*p < '0' || *p > '9')) p++;
    }
    for (; cnt < need; cnt++) vals[cnt] = INT64_MIN;  // absent run
    return true;
}

void rf_parse_date(const char *buf, int64_t buflen,
                   const int64_t *starts, int64_t nrows, int col,
                   char sep, int32_t *out, int32_t nullv) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            out[i] = nullv;
            if (!field_at(buf + starts[i], le, col, sep, &fs, &fe)
                || fs >= fe)
                continue;
            int64_t v[3];
            if (!date_runs(fs, fe, v, 3) || v[2] == INT64_MIN)
                continue;
            int64_t y = v[0] & 0xFFFF, m = v[1], d = v[2];
            if (m < 1 || m > 12 || d < 1 || d > 31) continue;
            out[i] = (int32_t)days_from_civil(y, m, d);
        }
    });
}

// Reference time_from_str (time.c:55): '-' anywhere flips sign,
// ':' and '.' BOTH advance the field, any other non-digit is null;
// needs h:m:s or h:m:s.ms; h/m/s wrap u8, ms wraps u16 and is RAW
// (".5" is 5 milliseconds).
void rf_parse_time(const char *buf, int64_t buflen,
                   const int64_t *starts, int64_t nrows, int col,
                   char sep, int32_t *out, int32_t nullv) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            out[i] = nullv;
            if (!field_at(buf + starts[i], le, col, sep, &fs, &fe))
                continue;
            int64_t parts[4] = {0, 0, 0, 0}, val = 0;
            int cnt = 0, sign = 1;
            bool bad = false;
            for (const char *p = fs; p < fe; p++) {
                if (*p == '-') { sign = -1; }
                else if (*p == ':' || *p == '.') {
                    if (cnt > 2) { bad = true; break; }
                    parts[cnt++] = val;
                    val = 0;
                } else if (*p >= '0' && *p <= '9')
                    val = val * 10 + (*p - '0');
                else { bad = true; break; }
            }
            if (bad) continue;
            if (cnt == 2) parts[2] = val;
            else if (cnt == 3) parts[3] = val;
            else continue;
            int64_t hh = parts[0] & 0xFF, mm = parts[1] & 0xFF,
                    ss = parts[2] & 0xFF, ms = parts[3] & 0xFFFF;
            out[i] = (int32_t)(sign * ((hh * 3600 + mm * 60 + ss)
                                       * 1000 + ms));
        }
    });
}

// Reference timestamp_from_str (timestamp.c:362): ISO when char 4 is
// '-' (strict YYYY-MM-DD[T hh:mm:ss[.frac]][Z|+hh:mm], frac padded to
// ns); otherwise up to 7 digit runs y m d h m s nanos with RAW nanos
// (".5" is 5 ns) and per-field validity.
inline bool ts_iso(const char *p, const char *e, int64_t *out_ns) {
    auto dig2 = [&](int64_t *v) {
        if (e - p < 2 || p[0] < '0' || p[0] > '9' ||
            p[1] < '0' || p[1] > '9') return false;
        *v = (p[0] - '0') * 10 + (p[1] - '0');
        p += 2;
        return true;
    };
    int64_t y = 0, mo, d, hh = 0, mm = 0, ss = 0, ns = 0;
    for (int i = 0; i < 4; i++) {
        if (p >= e || *p < '0' || *p > '9') return false;
        y = y * 10 + (*p++ - '0');
    }
    if (p >= e || *p != '-') return false;
    p++;
    if (!dig2(&mo) || mo < 1 || mo > 12) return false;
    if (p >= e || *p != '-') return false;
    p++;
    if (!dig2(&d) || d < 1 || d > 31) return false;
    if (p < e && (*p == 'T' || *p == ' ')) {
        p++;
        if (!dig2(&hh) || hh > 23 || p >= e || *p != ':') return false;
        p++;
        if (!dig2(&mm) || mm > 59 || p >= e || *p != ':') return false;
        p++;
        if (!dig2(&ss) || ss > 59) return false;
        if (p < e && *p == '.') {
            p++;
            int fd = 0;
            while (p < e && *p >= '0' && *p <= '9' && fd < 9) {
                ns = ns * 10 + (*p++ - '0');
                fd++;
            }
            for (; fd < 9; fd++) ns *= 10;
            while (p < e && *p >= '0' && *p <= '9') p++;
        }
    }
    int64_t v = days_from_civil(y, mo, d) * 86400000000000LL +
                (hh * 3600 + mm * 60 + ss) * 1000000000LL + ns;
    if (p < e && (*p == '+' || *p == '-')) {
        bool negz = *p == '-';
        p++;
        int64_t zh, zm = 0;
        if (!dig2(&zh)) return false;
        if (p < e && *p == ':') p++;
        if (e - p >= 2 && *p >= '0' && *p <= '9' && !dig2(&zm))
            return false;
        int64_t off = zh * 60 + zm;
        v -= (negz ? -off : off) * 60000000000LL;
    }
    *out_ns = v;
    return true;
}

void rf_parse_timestamp(const char *buf, int64_t buflen,
                        const int64_t *starts, int64_t nrows, int col,
                        char sep, int64_t *out, int64_t nullv) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            out[i] = nullv;
            if (!field_at(buf + starts[i], le, col, sep, &fs, &fe)
                || fs >= fe)
                continue;
            if (fe - fs >= 5 && fs[4] == '-') {
                int64_t v;
                if (ts_iso(fs, fe, &v)) out[i] = v;
                continue;
            }
            int64_t r[7];
            if (!date_runs(fs, fe, r, 7) || r[2] == INT64_MIN)
                continue;
            for (int k = 3; k < 7; k++)
                if (r[k] == INT64_MIN) r[k] = 0;
            int64_t y = r[0] & 0xFFFF;
            if (r[1] < 1 || r[1] > 12 || r[2] < 1 || r[2] > 31 ||
                r[3] > 23 || r[4] > 59 || r[5] > 59)
                continue;
            out[i] = days_from_civil(y, r[1], r[2]) * 86400000000000LL
                     + (r[3] * 3600 + r[4] * 60 + r[5]) * 1000000000LL
                     + (r[6] & 0xFFFFFFFFLL);
        }
    });
}

// Minimum field count over NON-BLANK lines (blank lines parse as
// all-null rows; a short non-blank line is a length error that the
// Python fallback raises). Quote-aware: separators inside quoted
// fields don't split; returns -1 when any line has an unterminated
// quote (err_length in the reference, io.c:496-499).
int64_t rf_min_fields(const char *buf, int64_t buflen,
                      const int64_t *starts, int64_t nrows, char sep) {
    std::vector<int64_t> mins(n_workers(), INT64_MAX);
    unsigned nw = n_workers();
    int64_t chunk = (nrows + nw - 1) / nw;
    std::vector<std::thread> ts;
    for (unsigned w = 0; w < nw; w++) {
        int64_t lo = (int64_t)w * chunk;
        int64_t hi = std::min(nrows, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([&, w, lo, hi] {
            int64_t m = INT64_MAX;
            for (int64_t i = lo; i < hi; i++) {
                const char *p = buf + starts[i];
                const char *le = line_end(buf, buflen, starts[i]);
                if (p >= le) continue;   // blank line
                int64_t f = 0;
                while (p <= le) {
                    if (p < le && *p == '"') {
                        const char *cq = (const char *)memchr(
                            p + 1, '"', le - p - 1);
                        if (!cq) { m = -1; break; }
                        p = cq + 2;
                    } else {
                        const char *sp = (const char *)memchr(
                            p, sep, le - p);
                        p = (sp ? sp : le) + 1;
                    }
                    f++;
                }
                if (m == -1) break;
                if (f < m) m = f;
            }
            mins[w] = m;
        });
    }
    for (auto &t : ts) t.join();
    int64_t m = INT64_MAX;
    for (auto v : mins) {
        if (v == -1) return -1;
        m = std::min(m, v);
    }
    return m;
}

// (offset, length) of column `col` per row — for strings/symbols
void rf_field_spans(const char *buf, int64_t buflen,
                    const int64_t *starts, int64_t nrows, int col,
                    char sep, int64_t *off, int32_t *len) {
    parallel_rows(nrows, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const char *le = line_end(buf, buflen, starts[i]);
            const char *fs, *fe;
            bool q;
            if (find_field(buf + starts[i], le, col, sep, &fs, &fe,
                           &q) == 1) {
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
