"""Oracle harness: compile and run the reference C program as a test oracle.

The reference (mounted read-only at /root/reference) fixes K/M/cutoff at
compile time (binning.c:10-13) and only prints the final unitigs
(binning.c:1180).  For golden-parity testing we need intermediate tables, so
this harness copies the sources into a scratch build directory, rewrites the
#define lines, and injects a small phase-dump hook of our own into main.
The patched copy is a build artifact used only to produce golden files and
live-diff tests; it is never shipped as part of the framework.

Output formats:
  stage=preprune / postprune : one line per table entry, iteration order:
      "<mmer>\t<kmer>\t<id,id,...>"   (read-id list head-to-tail, descending)
  stage=unitigs (default)    : print_kmers format -- one key per line
  stage=verbose              : print_kmer_read_ids format
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess
from typing import Dict, List, Optional, Tuple

REFERENCE = pathlib.Path("/root/reference")

_DUMP_HOOK = r"""
/* --- oracle phase-dump hook (injected by tools/oracle.py; not reference code) --- */
void oracle_dump_table(struct ZHashTable *hash_table)
{
    struct ZHashTable *kmer_hash;
    struct ZHashEntry *mmer_entry, *kmer_entry;
    ll_node *n;
    while ((mmer_entry = (struct ZHashEntry *)iterate_level_one_hash(hash_table, false, false)) != NULL)
    {
        kmer_hash = (struct ZHashTable *)mmer_entry->val;
        while ((kmer_entry = (struct ZHashEntry *)iterate_level_two_hash(kmer_hash, false, false)) != NULL)
        {
            printf("%s\t%s\t", (char *)mmer_entry->key, (char *)kmer_entry->key);
            n = (ll_node *)kmer_entry->val;
            while (n) { printf("%d%s", n->read_id, n->next ? "," : ""); n = n->next; }
            printf("\n");
        }
    }
}
/* --- end hook --- */

"""

_MAIN_TAIL_ORIG = """    // prune stored values and remove possibly erroneous kmers
    prune_data(hash_table);"""

_MAIN_TAIL_NEW = """    const char *oracle_stage = argc > 2 ? argv[2] : "unitigs";
    if (strcmp(oracle_stage, "preprune") == 0) { oracle_dump_table(hash_table); return 0; }
    // prune stored values and remove possibly erroneous kmers
    prune_data(hash_table);
    if (strcmp(oracle_stage, "postprune") == 0) { oracle_dump_table(hash_table); return 0; }"""

_PRINT_ORIG = """    // print kmers
    print_kmers(hash_table);"""

_PRINT_NEW = """    // print kmers
    if (strcmp(oracle_stage, "verbose") == 0) { print_kmer_read_ids(hash_table); return 0; }
    print_kmers(hash_table);"""


def build_oracle(
    build_dir: pathlib.Path,
    k: int = 31,
    m: int = 4,
    cutoff: int = 1,
    read_length: int = 101,
    optimize: str = "-O2",
) -> pathlib.Path:
    """Compile a patched oracle binary; returns its path (cached)."""
    build_dir = pathlib.Path(build_dir)
    tag = f"k{k}_m{m}_c{cutoff}_r{read_length}"
    out = build_dir / f"oracle_{tag}"
    if out.exists():
        return out
    src_dir = build_dir / f"src_{tag}"
    src_dir.mkdir(parents=True, exist_ok=True)
    for name in ("zhash.c", "zhash.h", "llist.c", "llist.h"):
        shutil.copy(REFERENCE / name, src_dir / name)
    text = (REFERENCE / "binning.c").read_text()
    text = text.replace("#define MMER_SIZE 4", f"#define MMER_SIZE {m}", 1)
    text = text.replace("#define KMER_SIZE 31", f"#define KMER_SIZE {k}", 1)
    text = text.replace(
        "#define ABUNDANCE_CUTOFF 1", f"#define ABUNDANCE_CUTOFF {cutoff}", 1
    )
    text = text.replace(
        "#define READ_LENGTH 101", f"#define READ_LENGTH {read_length}", 1
    )
    for needle in (_MAIN_TAIL_ORIG, _PRINT_ORIG):
        if needle not in text:
            raise RuntimeError(f"oracle patch anchor not found: {needle!r}")
    text = text.replace(_MAIN_TAIL_ORIG, _MAIN_TAIL_NEW, 1)
    text = text.replace(_PRINT_ORIG, _PRINT_NEW, 1)
    text = text.replace(
        "// pass file name containing reads\nint main", _DUMP_HOOK + "int main", 1
    )
    (src_dir / "binning.c").write_text(text)
    subprocess.run(
        [
            "gcc",
            optimize,
            "-w",
            "zhash.c",
            "binning.c",
            "llist.c",
            "-o",
            str(out.resolve()),
        ],
        cwd=src_dir,
        check=True,
        capture_output=True,
    )
    return out


_COUNTER_DECL = """
/* --- oracle adjacency-case counters (injected; not reference code) --- */
long oracle_c1 = 0, oracle_c3 = 0, oracle_c3d = 0;
long oracle_d1 = 0, oracle_d2 = 0, oracle_d3 = 0, oracle_d3d = 0;
"""

_FIRST_EXT_ANCHOR = """                        // create first extension
                        extend_entry = extension_node.extend_entry;"""

_FIRST_EXT_COUNT = (
    _FIRST_EXT_ANCHOR
    + """
                        { extern long oracle_c1, oracle_c3, oracle_c3d;
                          if ((*extend_entry)->next == (*kmer_entry)) oracle_c1++;
                          else { oracle_c3++;
                                 if (extend_entry == &((*kmer_entry)->next)) oracle_c3d++; } }"""
)

_FURTHER_EXT_ANCHOR = """                            extend_entry = extension_node.extend_entry;
                            further_extension = further_extend_kmers(further_extension, *extend_entry, forward);"""

_FURTHER_EXT_COUNT = """                            extend_entry = extension_node.extend_entry;
                            { extern long oracle_d1, oracle_d2, oracle_d3, oracle_d3d;
                              if (*extend_entry == (*kmer_entry)) oracle_d1++;
                              else if ((*extend_entry)->next == *kmer_entry) oracle_d2++;
                              else { oracle_d3++;
                                     if (kmer_entry == &((*extend_entry)->next)) oracle_d3d++; } }
                            further_extension = further_extend_kmers(further_extension, *extend_entry, forward);"""

_COUNTER_PRINT = """    { extern long oracle_c1, oracle_c3, oracle_c3d, oracle_d1, oracle_d2, oracle_d3, oracle_d3d;
      fprintf(stderr, "oracle_cases c1=%ld c3=%ld c3danger=%ld d1=%ld d2=%ld d3=%ld d3danger=%ld\\n",
              oracle_c1, oracle_c3, oracle_c3d, oracle_d1, oracle_d2, oracle_d3, oracle_d3d); }
    // print kmers"""


def build_instrumented(
    build_dir: pathlib.Path,
    k: int = 31,
    m: int = 4,
    cutoff: int = 1,
    read_length: int = 101,
) -> pathlib.Path:
    """Oracle variant counting extension adjacency/danger cases on stderr.

    Used to establish empirically whether the reference's dead second
    adjacency branch (binning.c:710, condition identical to binning.c:698)
    and the dangling-slot frees in the greedy loop (SURVEY.md 2.1.9) are
    ever exercised on a given input -- the replay engine asserts they are
    not, so this justifies its clean-semantics assumption per fixture.
    """
    build_dir = pathlib.Path(build_dir)
    tag = f"instr_k{k}_m{m}_c{cutoff}_r{read_length}"
    out = build_dir / f"oracle_{tag}"
    if out.exists():
        return out
    base = build_oracle(build_dir, k, m, cutoff, read_length)
    src_dir = build_dir / f"src_k{k}_m{m}_c{cutoff}_r{read_length}"
    text = (src_dir / "binning.c").read_text()
    for needle in (_FIRST_EXT_ANCHOR, _FURTHER_EXT_ANCHOR, "    // print kmers"):
        if needle not in text:
            raise RuntimeError(f"instrumentation anchor not found: {needle!r}")
    text = _COUNTER_DECL + text
    text = text.replace(_FIRST_EXT_ANCHOR, _FIRST_EXT_COUNT, 1)
    text = text.replace(_FURTHER_EXT_ANCHOR, _FURTHER_EXT_COUNT, 1)
    text = text.replace("    // print kmers", _COUNTER_PRINT, 1)
    instr_dir = build_dir / f"src_{tag}"
    instr_dir.mkdir(parents=True, exist_ok=True)
    for name in ("zhash.c", "zhash.h", "llist.c", "llist.h"):
        shutil.copy(REFERENCE / name, instr_dir / name)
    (instr_dir / "binning.c").write_text(text)
    subprocess.run(
        ["gcc", "-O2", "-w", "zhash.c", "binning.c", "llist.c", "-o", str(out.resolve())],
        cwd=instr_dir,
        check=True,
        capture_output=True,
    )
    return out


def run_oracle(
    binary: pathlib.Path, reads_file: pathlib.Path, stage: str = "unitigs"
) -> str:
    """Run the oracle; returns stdout."""
    proc = subprocess.run(
        [str(binary), str(reads_file), stage],
        check=True,
        capture_output=True,
        text=True,
        timeout=600,
    )
    return proc.stdout


def parse_dump(text: str) -> List[Tuple[str, str, List[int]]]:
    """Parse preprune/postprune dump lines into (mmer, kmer, ids)."""
    out = []
    for line in text.splitlines():
        if not line:
            continue
        mmer, kmer, ids = line.split("\t")
        out.append((mmer, kmer, [int(x) for x in ids.split(",")] if ids else []))
    return out


def dump_as_table(text: str) -> Dict[Tuple[str, str], List[int]]:
    """Dump -> {(mmer, kmer): [read ids, head-to-tail]} for multiset compare."""
    table: Dict[Tuple[str, str], List[int]] = {}
    for mmer, kmer, ids in parse_dump(text):
        assert (mmer, kmer) not in table, f"duplicate entry {(mmer, kmer)}"
        table[(mmer, kmer)] = ids
    return table


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("reads_file", type=pathlib.Path)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--cutoff", type=int, default=1)
    ap.add_argument("--read-length", type=int, default=101)
    ap.add_argument("--stage", default="unitigs")
    ap.add_argument(
        "--build-dir", type=pathlib.Path, default=pathlib.Path("/tmp/oracle_build")
    )
    args = ap.parse_args()
    binary = build_oracle(
        args.build_dir, args.k, args.m, args.cutoff, args.read_length
    )
    print(run_oracle(binary, args.reads_file, args.stage), end="")
