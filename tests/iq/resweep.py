"""Re-sweep tool: find reference .iq cases (psql outputformat) that the
front door newly passes, and optionally transcribe them into tests/iq/.

Usage: python tests/iq/resweep.py <name>... [--write]

The original corpus selection (tests/iq/README.md §Selection) was an
automated sweep; the front door gains rewrites every round, so cases
that failed then may pass now. This tool re-runs the sweep for the
named reference scripts, reports PASS/fail for every case absent from
the corpus, and with --write appends the passers verbatim (SQL +
expected table re-rendered in the corpus's mysql-box format).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

REF_DIR = "/root/reference/core/src/test/resources/sql"


def parse_psql(path):
    """Parse a psql-outputformat quidem script into result cases,
    skipping !if(false) blocks and each case's expected table."""
    cases = []
    lines = open(path).read().split("\n")
    n = len(lines)
    i, sql_start, sql_acc = 0, None, []
    depth_false = 0

    def cell(c):
        c = c.strip()
        return None if c in ("", "null") else c

    while i < n:
        ln = lines[i]
        if re.match(r"\s*!if \(false\) \{", ln):
            depth_false += 1
            i += 1
            sql_acc = []
            continue
        if depth_false:
            if ln.strip() == "!}":
                depth_false -= 1
            i += 1
            continue
        if ln.startswith("#") or ln.startswith("!") or not ln.strip():
            if ln.startswith("!"):
                sql_acc = []
                sql_start = None
            i += 1
            continue
        if sql_start is None:
            sql_start = i + 1
        sql_acc.append(ln)
        i += 1
        if not ln.rstrip().endswith(";"):
            continue
        sql = "\n".join(sql_acc).rstrip().rstrip(";")
        sql_acc, start_line = [], sql_start
        sql_start = None
        j = i
        hdr = lines[j] if j < n else ""
        cols = [c.strip() for c in hdr.split("|")]
        j += 1
        if j >= n or not re.match(r"^-+(\+-+)*$", lines[j].replace(" ", "")):
            continue
        j += 1
        rows = []
        while j < n and not re.match(r"^\(\d+ rows?\)$", lines[j].strip()):
            if lines[j].strip():
                rows.append([cell(c) for c in lines[j].split("|")])
            j += 1
        if j >= n:
            continue
        m = re.match(r"^\((\d+) rows?\)$", lines[j].strip())
        j += 1
        while j < n and not lines[j].strip():
            j += 1
        if m and int(m.group(1)) == len(rows) and j < n \
                and lines[j].strip() == "!ok":
            cases.append({"line": start_line, "sql": sql,
                          "cols": cols, "rows": rows})
            i = j + 1
    return cases


def box(cols, rows):
    cells = [[("" if v is None else v) for v in r] for r in rows]
    widths = [max([len(c)] + [len(r[i]) for r in cells])
              for i, c in enumerate(cols)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def line(vals):
        return "| " + " | ".join(v.ljust(w)
                                 for v, w in zip(vals, widths)) + " |"

    out = [sep, line(cols), sep] + [line(r) for r in cells] + [sep]
    out.append(f"({len(rows)} row{'s' if len(rows) != 1 else ''})")
    return "\n".join(out)


def main():
    from tests.quidem import assert_rows_match, parse_iq
    from drill_calcite_spark.session import get_spark
    from drill_calcite_spark.sql import calcite_sql
    from drill_calcite_spark.sources.test_schemas import (
        register_catchall, register_foodmart, register_hr, register_post,
        register_scott)

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    write = "--write" in sys.argv

    def norm(s):
        return re.sub(r"\s+", " ", s).strip().lower()

    spark = get_spark(app_name="iq_resweep", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    register_post(spark)
    register_scott(spark)
    register_hr(spark)
    register_catchall(spark)
    register_foodmart(spark)

    import glob

    # dedupe against the WHOLE corpus: some reference cases live in a
    # different corpus file (e.g. agg.iq's orinoco ORDERS cases sit in
    # calcite_orinoco.iq)
    corpus = set()
    for path in glob.glob("tests/iq/calcite_*.iq"):
        corpus.update(norm(c["sql"]) for c in parse_iq(path))

    import os

    for name in names:
        path = f"{REF_DIR}/{name}.iq"
        if not os.path.exists(path):
            # the babel module's dialect scripts (redshift.iq)
            path = (REF_DIR.replace("/core/", "/babel/") + f"/{name}.iq")
        if name == "redshift":
            # redshift.iq addresses Scott UNQUALIFIED (!use
            # scott-redshift) — alias the scott fixtures over the plain
            # names for this script, then restore the POST names after
            for t in ("emp", "dept", "salgrade"):
                spark.table(f"scott_{t}").createOrReplaceTempView(t)
        ref = parse_psql(path)
        if not ref:
            # mysql-box / csv outputformat: the corpus's reader handles it
            ref = parse_iq(path)
        ours = corpus
        missing = [c for c in ref if norm(c["sql"]) not in ours]
        chunks, failed = [], []
        for c in missing:
            try:
                got = calcite_sql(
                    spark, c["sql"],
                    schema_views={"scott": "scott_", "hr": "hr_"},
                ).limit(3000).collect()
                assert_rows_match(got, c["rows"], "x")
            except Exception as e:
                msg = (str(e) or type(e).__name__).split("\n")[0][:90]
                failed.append((c["line"], msg))
                continue
            chunks.append(
                f"# source: {name}.iq:{c['line']}\n{c['sql']};\n"
                f"{box(c['cols'], c['rows'])}\n\n!ok\n")
        print(f"== {name}: ref {len(ref)}, missing {len(missing)}, "
              f"newly-pass {len(chunks)}")
        for ln, e in failed:
            print(f"   fail :{ln} {e}")
        if write and chunks:
            with open(f"tests/iq/calcite_{name}.iq", "a") as f:
                f.write("\n# ---- re-sweep additions ----\n\n"
                        + "\n".join(chunks))
        if name == "redshift":
            register_post(spark)  # restore the POST emp/dept bindings


if __name__ == "__main__":
    main()
