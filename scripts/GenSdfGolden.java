// Golden-value generator for SimpleDateFormat parity tests.
//
// Runs the REAL java.text.SimpleDateFormat (Locale.ENGLISH, UTC,
// setLenient(false) — the engine's documented strict deviation from the
// reference's default-lenient parsing) over a case matrix and emits JSON:
//   [{"fmt": ..., "input": ..., "epoch_ms": N | null (= parse error)}, ...]
//
// Usage: java scripts/GenSdfGolden.java > tests/data/sdf_golden.json
// (regenerate whenever the case matrix changes; the output is checked in so
// the pytest suite never needs a JVM).

import java.text.ParsePosition;
import java.text.SimpleDateFormat;
import java.util.Date;
import java.util.Locale;
import java.util.TimeZone;

public class GenSdfGolden {
    static final String[][] CASES = {
        // regression: already-supported letters
        {"yyyy-MM-dd HH:mm:ss", "2023-11-14 22:13:20"},
        {"yyyy-MM-dd HH:mm:ss", "2023-02-29 00:00:00"},   // strict: invalid
        {"yy/M/d h:mm a", "99/1/5 7:45 PM"},
        {"yy/M/d h:mm a", "69/12/31 12:01 AM"},
        {"MMM d yyyy HH:mm:ss.SSS", "Feb 28 2024 23:59:59.999"},
        {"yyyy-MM-dd'T'HH:mm:ssX", "2021-06-01T08:30:00Z"},
        {"yyyy-MM-dd'T'HH:mm:ssX", "2021-06-01T08:30:00+0530"},  // X eats ±hh only
        {"yyyy-MM-dd'T'HH:mm:ssXX", "2021-06-01T08:30:00+0530"},
        {"yyyy-MM-dd'T'HH:mm:ssXXX", "2021-06-01T08:30:00+05:30"},
        {"yyyy-MM-dd'T'HH:mm:ssXX", "2021-06-01T08:30:00+05:30"},  // wrong shape
        {"yyyy-MM-dd HH:mm:ss Z", "2021-06-01 08:30:00 -0800"},
        // D: day-of-year
        {"yyyy DDD", "2023 1"},
        {"yyyy DDD", "2023 032"},
        {"yyyy DDD", "2023 365"},
        {"yyyy DDD", "2024 366"},
        {"yyyy DDD", "2023 366"},                          // strict: invalid
        {"yyyy DDD HH:mm", "2020 060 12:30"},
        {"yyyy-MM-dd DDD", "2023-03-05 064"},              // month/day + doy
        {"yyyy-MM-dd DDD", "2023-03-05 100"},              // conflicting doy
        // k: hour-of-day 1-24
        {"yyyy-MM-dd kk:mm", "2023-05-10 24:15"},
        {"yyyy-MM-dd kk:mm", "2023-05-10 01:15"},
        {"yyyy-MM-dd kk:mm", "2023-05-10 12:00"},
        {"yyyy-MM-dd kk:mm", "2023-05-10 00:15"},          // strict: invalid
        // K: hour-of-am/pm 0-11
        {"yyyy-MM-dd KK:mm a", "2023-05-10 00:30 PM"},
        {"yyyy-MM-dd KK:mm a", "2023-05-10 00:30 AM"},
        {"yyyy-MM-dd KK:mm a", "2023-05-10 11:30 PM"},
        {"yyyy-MM-dd KK:mm a", "2023-05-10 12:30 AM"},     // strict: invalid
        // w: week-of-year (US rules: first day Sunday, minimal days 1)
        {"yyyy ww", "2023 05"},
        {"yyyy ww", "2023 1"},
        {"yyyy ww", "1970 01"},
        {"yyyy ww", "2024 53"},
        {"yyyy-MM-dd ww", "2023-03-05 10"},                // date + week
        {"yyyy-MM-dd ww", "2023-03-05 99"},                // strict: invalid
        // weekday text combined with full date (strict: consistency checked)
        {"EEE yyyy-MM-dd", "Tue 2023-05-09"},
        {"EEE yyyy-MM-dd", "Mon 2023-05-09"},              // wrong weekday
        {"EEEE yyyy-MM-dd", "Tuesday 2023-05-09"},
        {"EEE yyyy-MM-dd", "Tues 2023-05-09"},             // unknown form
        // h bounds (1-12)
        {"yyyy-MM-dd hh:mm a", "2023-05-10 00:30 AM"},     // strict: invalid
        {"yyyy-MM-dd hh:mm a", "2023-05-10 13:30 PM"},     // strict: invalid
        // K without an a field: defaults to AM
        {"yyyy-MM-dd KK:mm", "2023-05-10 05:30"},
        // k=24 at year end stays same-day 00:00
        {"yyyy-MM-dd kk:mm", "2023-12-31 24:00"},
        // F: day-of-week-in-month (May 9 2023 = 2nd Tuesday)
        {"yyyy-MM-dd F", "2023-05-09 2"},
        {"yyyy-MM-dd F", "2023-05-09 1"},                  // strict: wrong F
        {"yyyy-MM F EEE", "2023-05 2 Tue"},                // resolve 2nd Tue
        {"yyyy-MM F EEE", "2023-05 5 Mon"},                // 5th Mon exists
        {"yyyy-MM F EEE", "2023-06 5 Mon"},                // no 5th Mon in Jun
        // u: day number of week, 1 = Monday (Tue = 2)
        {"yyyy-MM-dd u", "2023-05-09 2"},
        {"yyyy-MM-dd u", "2023-05-09 7"},                  // strict: wrong u
        {"YYYY ww u", "2024 01 1"},                        // week-date resolve
        // W: week-of-month (US rules)
        {"yyyy-MM-dd W", "2023-05-09 2"},
        {"yyyy-MM-dd W", "2023-05-09 3"},                  // strict: wrong W
        {"yyyy-MM W EEE", "2023-05 2 Tue"},                // resolve via M+W+E
        {"yyyy-MM W EEE", "2023-05 9 Tue"},                // no week 9
        // L: standalone month (ENGLISH: same symbols as M)
        {"yyyy-LL-dd", "2023-05-09"},
        {"LLL d yyyy", "Feb 28 2024"},
        // c is a java.time letter, ILLEGAL in SimpleDateFormat → whole parse fails
        {"ccc yyyy-MM-dd", "Tue 2023-05-09"},
        {"ccc yyyy-MM-dd", "Mon 2023-05-09"},
        // G: era (AD only; BC/pre-1582 out of scope — hybrid-calendar dates)
        {"G yyyy-MM-dd", "AD 2023-05-09"},
        // Y: week year (+ w [+ E/u] resolve through the week date)
        {"YYYY ww EEE", "2024 01 Mon"},                    // Jan 1 2024
        {"YYYY ww EEE", "2024 01 Sun"},                    // Dec 31 2023 (!)
        {"YYYY ww", "2024 10"},                            // default DOW = Sun
        {"YYYY ww", "2024 53"},                            // 2024 has 52 weeks?
        {"YYYY ww EEE", "2022 53 Sat"},                    // 2022-week53 check
        // prefix-match semantics: trailing garbage ignored
        {"yyyy-MM-dd", "2023-05-09 and more"},
    };

    public static void main(String[] args) {
        TimeZone utc = TimeZone.getTimeZone("UTC");
        StringBuilder sb = new StringBuilder("[\n");
        for (int i = 0; i < CASES.length; i++) {
            String fmt = CASES[i][0], input = CASES[i][1];
            Long ms = null;
            try {
                SimpleDateFormat sdf = new SimpleDateFormat(fmt, Locale.ENGLISH);
                sdf.setTimeZone(utc);
                sdf.setLenient(false);
                // deterministic 2-digit-year window 1970-2069 (== the
                // kernel's fixed pivot; the JDK default is now-relative,
                // which would rot this golden file)
                sdf.set2DigitYearStart(new Date(0));
                ParsePosition pos = new ParsePosition(0);
                Date d = sdf.parse(input, pos);  // prefix match, like the kernel
                if (d != null) ms = d.getTime();
            } catch (Exception e) { /* ms stays null */ }
            sb.append(String.format(
                "  {\"fmt\": %s, \"input\": %s, \"epoch_ms\": %s}%s\n",
                q(fmt), q(input), ms == null ? "null" : ms.toString(),
                i == CASES.length - 1 ? "" : ","));
        }
        sb.append("]");
        System.out.println(sb);
    }

    static String q(String s) {
        return "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"";
    }
}
