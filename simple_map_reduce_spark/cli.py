"""Thin CLI over the MapleJuice facade — the reference's interactive
shell (``main.rs:209-308``) as subcommands.

Usage examples (mirror ``README.md:42-127``):

    python -m simple_map_reduce_spark put data.csv traffic
    python -m simple_map_reduce_spark ls
    python -m simple_map_reduce_spark sql "SELECT ALL FROM traffic WHERE Video,Radio"
    python -m simple_map_reduce_spark maple ./map.py 7 wc_mid traffic
    python -m simple_map_reduce_spark juice ./reduce.py 7 wc_mid wc_out --delete
    python -m simple_map_reduce_spark get wc_out ./out.txt
"""

from __future__ import annotations

import argparse
import os
import sys

from .engine import MapleJuice
from .session import get_session

DEFAULT_WAREHOUSE = os.environ.get("SMR_WAREHOUSE", os.path.expanduser("~/.smr_warehouse"))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="simple_map_reduce_spark")
    p.add_argument("--warehouse", default=DEFAULT_WAREHOUSE)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("put", help="register a local file as a named table")
    sp.add_argument("local"), sp.add_argument("name")
    sp.add_argument("--fmt", default="text", choices=["text", "csv", "json", "parquet"])

    sg = sub.add_parser("get", help="export a table to a local file")
    sg.add_argument("name"), sg.add_argument("local")

    sub.add_parser("ls", help="list tables")

    sd = sub.add_parser("delete", help="drop a table")
    sd.add_argument("name")

    sq = sub.add_parser("sql", help="run a reference SQL statement")
    sq.add_argument("statement")

    sm = sub.add_parser("maple", help="map phase: <exe> <num_tasks> <out_prefix> <input_prefix> [args...]")
    sm.add_argument("exe"), sm.add_argument("num_tasks", type=int)
    sm.add_argument("out_prefix"), sm.add_argument("input_prefix")
    sm.add_argument("args", nargs="*")

    sj = sub.add_parser("juice", help="reduce phase: <exe> <num_tasks> <in_prefix> <out_name>")
    sj.add_argument("exe"), sj.add_argument("num_tasks", type=int)
    sj.add_argument("in_prefix"), sj.add_argument("out_name")
    sj.add_argument("--delete", action="store_true", help="drop intermediates after the reduce")

    sc = sub.add_parser(
        "compact", help="rewrite a table into ~target-size parquet files"
    )
    sc.add_argument("name")
    sc.add_argument("--target-mb", type=int, default=128)

    ss = sub.add_parser("snapshot", help="freeze a table's contents as a numbered version")
    ss.add_argument("name")

    sv = sub.add_parser("versions", help="list a table's snapshot versions")
    sv.add_argument("name")

    sr = sub.add_parser("restore", help="roll a table back to a snapshot version")
    sr.add_argument("name"), sr.add_argument("version", type=int)

    sub.add_parser("repl", help="interactive shell (the reference's prompt, main.rs:209-308)")

    return p


def main(argv: list[str] | None = None) -> int:
    ns = build_parser().parse_args(argv)
    spark = get_session(app_name="smr-cli")
    spark.sparkContext.setLogLevel("ERROR")
    mj = MapleJuice(spark, ns.warehouse)

    if ns.cmd == "put":
        mj.put(ns.local, ns.name, ns.fmt)
        print(f"put {ns.local} -> {ns.name}")
    elif ns.cmd == "get":
        mj.get(ns.name, ns.local)
        print(f"get {ns.name} -> {ns.local}")
    elif ns.cmd == "ls":
        for name in mj.ls():
            print(name)
    elif ns.cmd == "delete":
        ok = mj.delete(ns.name)
        print("deleted" if ok else "not found")
        return 0 if ok else 1
    elif ns.cmd == "sql":
        df = mj.sql(ns.statement)
        for row in df.limit(20).collect():
            print("\t".join("" if v is None else str(v) for v in row))
        print(f"-- {df.count()} rows")
    elif ns.cmd == "maple":
        exe = ns.exe if not os.path.exists(ns.exe) else f"python3 {ns.exe}"
        keys = mj.maple(exe, ns.num_tasks, ns.out_prefix, ns.input_prefix, tuple(ns.args))
        print("\n".join(keys))
    elif ns.cmd == "juice":
        exe = ns.exe if not os.path.exists(ns.exe) else f"python3 {ns.exe}"
        df = mj.juice(exe, ns.num_tasks, ns.in_prefix, ns.out_name, ns.delete)
        print(f"-- {df.count()} rows -> {ns.out_name}")
    elif ns.cmd == "compact":
        n = mj.catalog.compact(ns.name, ns.target_mb * 1024 * 1024)
        print(f"compacted {ns.name} -> {n} file(s)")
    elif ns.cmd == "snapshot":
        v = mj.catalog.snapshot(ns.name)
        print(f"snapshot {ns.name} -> v{v}")
    elif ns.cmd == "versions":
        for v in mj.catalog.versions(ns.name):
            print(f"v{v}")
    elif ns.cmd == "restore":
        mj.catalog.restore(ns.name, ns.version)
        print(f"restored {ns.name} <- v{ns.version}")
    elif ns.cmd == "repl":
        repl(mj)
    return 0


def repl(mj: MapleJuice, stdin=None, stdout=None) -> None:
    """One-command-per-line shell, mirroring the reference's prompt loop
    (``main.rs:209-308``): the same subcommand grammar as the CLI plus
    raw ``SELECT ALL ...`` statements; ``exit`` leaves."""
    import shlex

    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    parser = build_parser()
    print("simple-map-reduce-spark shell — 'exit' to quit", file=stdout)
    for raw in stdin:
        line = raw.strip()
        if not line:
            continue
        if line.lower() in ("exit", "quit"):
            break
        try:
            if line.upper().startswith("SELECT"):
                df = mj.sql(line)
                for row in df.limit(20).collect():
                    print("\t".join("" if v is None else str(v) for v in row), file=stdout)
                print(f"-- {df.count()} rows", file=stdout)
                continue
            ns = parser.parse_args(shlex.split(line))
            ns.warehouse = mj.catalog.root  # shell is bound to one warehouse
            _dispatch(ns, mj, stdout)
        except SystemExit:  # argparse error: keep the shell alive
            print("?: put/get/ls/delete/sql/maple/juice or SELECT ALL ...", file=stdout)
        except Exception as exc:
            print(f"error: {exc}", file=stdout)


def _dispatch(ns: argparse.Namespace, mj: MapleJuice, out) -> None:
    if ns.cmd == "put":
        mj.put(ns.local, ns.name, ns.fmt)
        print(f"put {ns.local} -> {ns.name}", file=out)
    elif ns.cmd == "get":
        mj.get(ns.name, ns.local)
        print(f"get {ns.name} -> {ns.local}", file=out)
    elif ns.cmd == "ls":
        for name in mj.ls():
            print(name, file=out)
    elif ns.cmd == "delete":
        print("deleted" if mj.delete(ns.name) else "not found", file=out)
    elif ns.cmd == "sql":
        df = mj.sql(ns.statement)
        print(f"-- {df.count()} rows", file=out)
    elif ns.cmd == "maple":
        exe = ns.exe if not os.path.exists(ns.exe) else f"python3 {ns.exe}"
        keys = mj.maple(exe, ns.num_tasks, ns.out_prefix, ns.input_prefix, tuple(ns.args))
        print("\n".join(keys), file=out)
    elif ns.cmd == "juice":
        exe = ns.exe if not os.path.exists(ns.exe) else f"python3 {ns.exe}"
        df = mj.juice(exe, ns.num_tasks, ns.in_prefix, ns.out_name, ns.delete)
        print(f"-- {df.count()} rows -> {ns.out_name}", file=out)
    elif ns.cmd == "compact":
        n = mj.catalog.compact(ns.name, ns.target_mb * 1024 * 1024)
        print(f"compacted {ns.name} -> {n} file(s)", file=out)
    elif ns.cmd == "snapshot":
        v = mj.catalog.snapshot(ns.name)
        print(f"snapshot {ns.name} -> v{v}", file=out)
    elif ns.cmd == "versions":
        for v in mj.catalog.versions(ns.name):
            print(f"v{v}", file=out)
    elif ns.cmd == "restore":
        mj.catalog.restore(ns.name, ns.version)
        print(f"restored {ns.name} <- v{ns.version}", file=out)


if __name__ == "__main__":
    sys.exit(main())
