#!/usr/bin/env python3
"""Generate QUERIES.md — a mechanical index of the query registry.

For every entry in src/main/scala/graft/queries/Shard*.scala: the query
name, its shard file:line (clickable), whether it has a DuckDB oracle, and
the first sentence of its doc comment. Derived from source on every run so
it can never drift the way hand-kept counts did (README said 618 while HEAD
had 633). Run: python3 tools/gen_query_index.py
"""
import re, glob, os

SRC = "src/main/scala/graft/queries"
ENTRY = re.compile(r'^    "(q\d+[a-z0-9_]*)" ->')


def entries(pattern):
    out = {}
    for path in sorted(glob.glob(f"{SRC}/{pattern}")):
        lines = open(path).read().split("\n")
        for i, l in enumerate(lines):
            m = ENTRY.match(l)
            if not m:
                continue
            # walk back over the contiguous comment block
            j = i
            comment = []
            while j - 1 >= 0 and (lines[j - 1].strip().startswith("//") or
                                  lines[j - 1].strip() == ""):
                j -= 1
                t = lines[j].strip()
                if t.startswith("//"):
                    comment.insert(0, t[2:].strip())
            desc = " ".join(comment)
            # first sentence-ish: cut at the first " — " elaboration or at ~160 chars
            desc = re.split(r"(?<=[.;:]) ", desc, 1)[0] if len(desc) > 160 else desc
            out[m.group(1)] = (os.path.basename(path), i + 1, desc[:220])
    return out


def main():
    q = entries("Shard*.scala")
    o = entries("OracleShard*.scala")
    missing_oracle = sorted(set(q) - set(o))
    orphan_oracle = sorted(set(o) - set(q))

    def key(name):
        return int(re.match(r"q(\d+)", name).group(1))

    with open("QUERIES.md", "w") as f:
        f.write("# Query index (generated — do not edit)\n\n")
        f.write(f"{len(q)} queries, {len(o)} DuckDB oracles. ")
        f.write("Regenerate with `python3 tools/gen_query_index.py`.\n\n")
        if missing_oracle:
            f.write(f"**Queries without an oracle**: {', '.join(missing_oracle)}\n\n")
        if orphan_oracle:
            f.write(f"**Oracles without a query (BUG)**: {', '.join(orphan_oracle)}\n\n")
        f.write("| query | where | description |\n|---|---|---|\n")
        for name in sorted(q, key=key):
            path, line, desc = q[name]
            desc = desc.replace("|", "\\|")
            f.write(f"| {name} | `{path}:{line}` | {desc} |\n")
    print(f"QUERIES.md: {len(q)} queries, {len(missing_oracle)} without oracle,"
          f" {len(orphan_oracle)} orphan oracles")


if __name__ == "__main__":
    main()
