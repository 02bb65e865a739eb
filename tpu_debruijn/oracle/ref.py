"""Sequential Python reimplementation of rust-debruijn's core algorithms.

Ground truth for the engine's parity tests.  File:line citations point into
/root/reference/src.  Kmers are plain python ints (2K-bit lexicographic
rank); sequences are lists/arrays of 2-bit base codes.

One deliberate difference: where the reference iterates kmers in MPHF slot
order (compression.rs:574), the oracle iterates in **sorted kmer order** —
a deterministic, reproducible total order that the engine also uses.  The
set of unitigs produced is identical; only discovery order / orientation
seeding differs from the Rust binary (see SURVEY.md section 7 hard part 1).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

LEFT, RIGHT = 0, 1


# ---------------------------------------------------------------------------
# int-rank kmer ops (lib.rs Kmer trait semantics)
# ---------------------------------------------------------------------------


class OKmer:
    """Namespace of pure functions on (k, int-rank) kmers."""

    @staticmethod
    def mask(k: int) -> int:
        return (1 << (2 * k)) - 1

    @staticmethod
    def get(k: int, v: int, pos: int) -> int:
        return (v >> (2 * (k - 1 - pos))) & 3

    @staticmethod
    def set(k: int, v: int, pos: int, b: int) -> int:
        sh = 2 * (k - 1 - pos)
        return (v & ~(3 << sh)) | (b << sh)

    @staticmethod
    def extend_right(k: int, v: int, b: int) -> int:
        return ((v << 2) | b) & OKmer.mask(k)

    @staticmethod
    def extend_left(k: int, v: int, b: int) -> int:
        return (v >> 2) | (b << (2 * (k - 1)))

    @staticmethod
    def extend(k: int, v: int, b: int, d: int) -> int:
        return OKmer.extend_left(k, v, b) if d == LEFT else OKmer.extend_right(k, v, b)

    @staticmethod
    def rc(k: int, v: int) -> int:
        out = 0
        for _ in range(k):
            out = (out << 2) | ((~v) & 3)
            v >>= 2
        return out

    @staticmethod
    def min_rc_flip(k: int, v: int) -> Tuple[int, bool]:
        r = OKmer.rc(k, v)
        return (v, False) if v < r else (r, True)

    @staticmethod
    def min_rc(k: int, v: int) -> int:
        return min(v, OKmer.rc(k, v))

    @staticmethod
    def is_palindrome(k: int, v: int) -> bool:
        return k % 2 == 0 and v == OKmer.rc(k, v)

    @staticmethod
    def from_bases(bases: Sequence[int]) -> int:
        v = 0
        for b in bases:
            v = (v << 2) | int(b)
        return v

    @staticmethod
    def to_bases(k: int, v: int) -> List[int]:
        return [(v >> (2 * (k - 1 - i))) & 3 for i in range(k)]


# ---------------------------------------------------------------------------
# Exts helpers on plain ints (lib.rs:569-749)
# ---------------------------------------------------------------------------


def e_merge(l: int, r: int) -> int:
    return (l & 0x0F) | (r & 0xF0)


def e_mk_left(b: int) -> int:
    return 1 << b


def e_mk_right(b: int) -> int:
    return (1 << b) << 4


def e_dir_bits(e: int, d: int) -> int:
    return (e >> (4 * d)) & 0xF


def e_num(e: int, d: int) -> int:
    return bin(e_dir_bits(e, d)).count("1")


def e_unique(e: int, d: int) -> Optional[int]:
    b = e_dir_bits(e, d)
    if bin(b).count("1") != 1:
        return None
    return b.bit_length() - 1


def e_single_dir(e: int, d: int) -> int:
    return e_dir_bits(e, d)


def e_complement(e: int) -> int:
    r = ((e & 0x55) << 1) | ((e >> 1) & 0x55)
    return ((r & 0x33) << 2) | ((r >> 2) & 0x33)


def e_reverse(e: int) -> int:
    return ((e & 0x0F) << 4) | ((e >> 4) & 0x0F)


def e_rc(e: int) -> int:
    return e_complement(e_reverse(e))


def e_from_single_dirs(l: int, r: int) -> int:
    return ((r & 0x0F) << 4) | (l & 0x0F)


def e_set(e: int, d: int, b: int) -> int:
    return e | (1 << (b + 4 * d))


def e_from_slice_bounds(src: Sequence[int], start: int, length: int) -> int:
    l = (1 << int(src[start - 1])) if start > 0 else 0
    r = (1 << int(src[start + length])) if start + length < len(src) else 0
    return (r << 4) | l


# ---------------------------------------------------------------------------
# iter_kmer_exts (lib.rs:809-842)
# ---------------------------------------------------------------------------


def iter_kmer_exts(seq: Sequence[int], k: int, seq_exts: int = 0):
    """Yield (kmer_rank, exts) for each kmer of seq, with boundary exts."""
    n = len(seq)
    if n < k:
        return
    kmer = OKmer.from_bases(seq[:k])
    for pos in range(k, n + 1):
        next_base = int(seq[pos]) if pos < n else 0
        cur_left = seq_exts if pos == k else e_mk_left(int(seq[pos - k - 1]))
        cur_right = e_mk_right(next_base) if pos < n else seq_exts
        yield kmer, e_merge(cur_left, cur_right)
        kmer = OKmer.extend_right(k, kmer, next_base)


# ---------------------------------------------------------------------------
# summarizers (filter.rs:27-101)
# ---------------------------------------------------------------------------


class CountFilter:
    """CountFilter (filter.rs:40-63): count observations, saturate at u16."""

    def __init__(self, min_kmer_obs: int):
        self.min_kmer_obs = min_kmer_obs

    def summarize(self, items):
        all_exts = 0
        count = 0
        for _, exts, _ in items:
            count = min(count + 1, 0xFFFF)
            all_exts |= exts
        return count >= self.min_kmer_obs, all_exts, count


class CountFilterSet:
    """CountFilterSet (filter.rs:68-101): sorted-deduped label list."""

    def __init__(self, min_kmer_obs: int):
        self.min_kmer_obs = min_kmer_obs

    def summarize(self, items):
        all_exts = 0
        data = []
        nobs = 0
        for _, exts, d in items:
            data.append(d)
            all_exts |= exts
            nobs += 1
        out = sorted(set(data))
        return nobs >= self.min_kmer_obs, all_exts, out


# ---------------------------------------------------------------------------
# filter_kmers (filter.rs:139-231)
# ---------------------------------------------------------------------------


def filter_kmers(
    seqs: Sequence[Tuple[Sequence[int], int, object]],
    k: int,
    summarizer,
    stranded: bool,
    report_all_kmers: bool = False,
):
    """Returns (table, all_kmers): table = sorted list of (kmer, exts, data)."""
    rc_norm = not stranded
    obs: Dict[int, List[Tuple[int, int, object]]] = {}
    order: List[int] = []
    for seq, seq_exts, d in seqs:
        for kmer, exts in iter_kmer_exts(seq, k, seq_exts):
            if rc_norm:
                min_kmer, flip = OKmer.min_rc_flip(k, kmer)
                if flip:
                    exts = e_rc(exts)
                kmer = min_kmer
            obs.setdefault(kmer, []).append((kmer, exts, d))

    all_kmers = []
    table = []
    for kmer in sorted(obs):
        is_valid, exts, data = summarizer.summarize(obs[kmer])
        if report_all_kmers:
            all_kmers.append(kmer)
        if is_valid:
            table.append((kmer, exts, data))
    return table, all_kmers


def remove_censored_exts_sharded(stranded, k, valid, all_kmers):
    """filter.rs:238-276 semantics on a sorted list of (kmer, exts, data)."""
    valid_set = {kv for kv, _, _ in valid}
    all_set = set(all_kmers)
    out = []
    for kmer, exts, data in valid:
        new_exts = 0
        for d in (LEFT, RIGHT):
            for b in range(4):
                if e_dir_bits(exts, d) & (1 << b):
                    ext_kmer = OKmer.extend(k, kmer, b, d)
                    if not stranded:
                        ext_kmer = OKmer.min_rc(k, ext_kmer)
                    censored = False if ext_kmer in valid_set else ext_kmer in all_set
                    if not censored:
                        new_exts = e_set(new_exts, d, b)
        out.append((kmer, new_exts, data))
    return out


def remove_censored_exts(stranded, k, valid):
    """filter.rs:280-306: keep only exts to valid kmers."""
    valid_set = {kv for kv, _, _ in valid}
    out = []
    for kmer, exts, data in valid:
        new_exts = 0
        for d in (LEFT, RIGHT):
            for b in range(4):
                if e_dir_bits(exts, d) & (1 << b):
                    ext_kmer = OKmer.extend(k, kmer, b, d)
                    if not stranded:
                        ext_kmer = OKmer.min_rc(k, ext_kmer)
                    if ext_kmer in valid_set:
                        new_exts = e_set(new_exts, d, b)
        out.append((kmer, new_exts, data))
    return out


# ---------------------------------------------------------------------------
# compression specs (compression.rs:34-98)
# ---------------------------------------------------------------------------


class SimpleCompress:
    def __init__(self, func: Callable):
        self.func = func

    def reduce(self, d, other):
        return self.func(d, other)

    def join_test(self, d1, d2) -> bool:
        return True


class ScmapCompress:
    def reduce(self, d, other):
        assert d == other
        return d

    def join_test(self, d1, d2) -> bool:
        return d1 == d2


# ---------------------------------------------------------------------------
# compress_kmers (compression.rs:355-615, CompressFromHash)
# ---------------------------------------------------------------------------


class _Hash:
    """Sorted-array stand-in for BoomHashMap2: slot id = sorted rank."""

    def __init__(self, table):
        self.kmers = [t[0] for t in table]
        self.exts = [t[1] for t in table]
        self.data = [t[2] for t in table]
        self.ids = {kv: i for i, kv in enumerate(self.kmers)}

    def __len__(self):
        return len(self.kmers)


def compress_kmers(stranded: bool, spec, table, k: int):
    """Path compression; returns list of (seq_bases, exts, data) nodes.

    Direct reimplementation of CompressFromHash::compress_kmers
    (compression.rs:545-583) with slot order = sorted kmer order.
    """
    index = _Hash(table)
    n = len(index)
    available = set(range(n))

    def get_kmer_data(kv):
        i = index.ids[kv]
        return index.exts[i], index.data[i]

    def try_extend_kmer(kv, d):
        """compression.rs:382-444.  Returns ('u', next, next_dir) or ('t', ext)."""
        exts, kmer_data = get_kmer_data(kv)
        if e_num(exts, d) != 1 or ((not stranded) and OKmer.is_palindrome(k, kv)):
            return ("t", e_single_dir(exts, d))
        b = e_unique(exts, d)
        nxt = OKmer.extend(k, kv, b, d)
        do_flip = False
        if not stranded:
            nxt, do_flip = OKmer.min_rc_flip(k, nxt)
        next_dir = (1 - d) if do_flip else d
        is_pal = (not stranded) and OKmer.is_palindrome(k, nxt)
        nid = index.ids.get(nxt)
        if nid is None or nid not in available:
            return ("t", e_single_dir(exts, d))
        incoming = (1 - d) if not do_flip else d
        nxt_exts, nxt_data = get_kmer_data(nxt)
        incoming_count = e_num(nxt_exts, incoming)
        can_join = spec.join_test(kmer_data, nxt_data)
        if incoming_count == 0 and not is_pal:
            raise AssertionError("unreachable: no incoming ext")
        if can_join and incoming_count == 1 and not is_pal:
            return ("u", nxt, next_dir)
        return ("t", e_single_dir(exts, d))

    def extend_kmer(kv, start_dir, path):
        """compression.rs:450-479."""
        cur, curd = kv, start_dir
        path.clear()
        available.discard(index.ids[kv])
        while True:
            r = try_extend_kmer(cur, curd)
            if r[0] == "u":
                _, nxt, nd = r
                path.append((nxt, nd))
                available.discard(index.ids[nxt])
                cur, curd = nxt, nd
            else:
                return r[1]

    def build_node(seed_id):
        """compression.rs:483-541."""
        seed = index.kmers[seed_id]
        edge_seq = list(OKmer.to_bases(k, seed))
        node_data = index.data[seed_id]
        path: List[Tuple[int, int]] = []

        l_ext = extend_kmer(seed, LEFT, path)
        for nxt, d in path:
            kv = nxt if d == LEFT else OKmer.rc(k, nxt)
            edge_seq.insert(0, OKmer.get(k, kv, 0))
            node_data = spec.reduce(node_data, get_kmer_data(nxt)[1])
        if path:
            left_extend = l_ext if path[-1][1] == LEFT else e_complement(l_ext)
        else:
            left_extend = l_ext

        r_ext = extend_kmer(seed, RIGHT, path)
        for nxt, d in path:
            kv = OKmer.rc(k, nxt) if d == LEFT else nxt
            edge_seq.append(OKmer.get(k, kv, k - 1))
            node_data = spec.reduce(node_data, get_kmer_data(nxt)[1])
        if path:
            right_extend = e_complement(r_ext) if path[-1][1] == LEFT else r_ext
        else:
            right_extend = r_ext

        return edge_seq, e_from_single_dirs(left_extend, right_extend), node_data

    nodes = []
    for seed in range(n):
        if seed in available:
            nodes.append(build_node(seed))
    return nodes


# ---------------------------------------------------------------------------
# MSP scanner (msp.rs:159-324)
# ---------------------------------------------------------------------------


def msp_scan(seq: Sequence[int], k: int, p: int, score: Callable[[int], int]):
    """Scanner::scan (msp.rs:207-276).

    Returns list of (minimizer_rank, start, length, minimizer_pos).
    ``score`` takes a pmer rank.
    """
    m = len(seq)
    assert m >= k

    def pmer_at(pos: int) -> int:
        return OKmer.from_bases(seq[pos : pos + p])

    def mp(pos: int):
        kv = pmer_at(pos)
        return (score(kv), pos, kv)

    def less(a, b):
        """MinPos ordering (msp.rs:127-141): val asc, then pos DESC."""
        if a[0] != b[0]:
            return a[0] < b[0]
        return a[1] > b[1]

    def incr(mpv):
        _, pos, kv = mpv
        kv2 = OKmer.extend_right(p, kv, int(seq[pos + p]))
        return (score(kv2), pos + 1, kv2)

    def find_min(start, stop):
        best = mp(start)
        cur = best
        while cur[1] < stop:
            cur = incr(cur)
            if less(cur, best):
                best = cur
        return best

    min_positions = []
    min_pos = find_min(0, k - p)
    end_pos = mp(k - p)
    min_positions.append((0, min_pos))

    for i in range(1, m - k + 1):
        end_pos = incr(end_pos)
        if i > min_pos[1]:
            min_pos = find_min(i, i + k - p)
            min_positions.append((i, min_pos))
        elif end_pos[0] < min_pos[0]:
            min_pos = end_pos
            min_positions.append((i, min_pos))

    slices = []
    for j in range(len(min_positions) - 1):
        start_pos, mpv = min_positions[j]
        next_pos, _ = min_positions[j + 1]
        slices.append((mpv[2], start_pos, next_pos + k - 1 - start_pos, mpv[1]))
    last_pos, mpv = min_positions[-1]
    slices.append((mpv[2], last_pos, m - last_pos, mpv[1]))
    return slices


def msp_sequence(seq, k: int, p: int, permutation=None, rc: bool = True):
    """msp.rs:279-324: returns list of (bucket, exts, subseq_bases)."""
    if len(seq) < k:
        return []
    # identity permutation (msp.rs:298-303) applied lazily: materializing
    # list(range(4**p)) is 4.3e9 entries at p=16
    lookup = (lambda v: v) if permutation is None else (lambda v: permutation[v])

    def score(pv: int) -> int:
        if rc:
            return min(lookup(pv), lookup(OKmer.rc(p, pv)))
        return lookup(pv)

    out = []
    for minimizer, start, length, _mpos in msp_scan(seq, k, p, score):
        sub = list(seq[start : start + length])
        exts = e_from_slice_bounds(seq, start, length)
        bucket = OKmer.min_rc(p, minimizer)
        out.append((bucket, exts, sub))
    return out


# ---------------------------------------------------------------------------
# fixtures (test.rs:14-132), seeded
# ---------------------------------------------------------------------------


def random_dna(rng, length: int) -> List[int]:
    return [int(rng.integers(0, 4)) for _ in range(length)]


def edit_dna(rng, seq: List[int], p: float) -> None:
    for i in range(len(seq)):
        if rng.random() < p:
            seq[i] = int(rng.integers(0, 4))


def simple_random_contigs(rng) -> List[List[int]]:
    """test.rs:58-95: two contigs sharing a 100bp core + a palindrome contig."""
    p1 = random_dna(rng, 40)
    p2 = random_dna(rng, 30)
    pc = random_dna(rng, 100)
    p3 = random_dna(rng, 30)
    p4 = random_dna(rng, 40)
    c1 = p1 + pc + p3
    c2 = p2 + pc + p4
    c3 = random_dna(rng, 30)
    pal1 = random_dna(rng, 33)
    pal2 = [(~b) & 3 for b in reversed(pal1)]
    c3 = c3 + pal1 + pal2 + random_dna(rng, 50)
    return [c1, c2, c3]


def random_contigs(rng) -> List[List[int]]:
    """test.rs:98-132: Gamma-distributed chunk reuse across chromosomes."""
    nchunks = max(5, int(rng.gamma(0.6, 25.0)))
    chunks = [
        random_dna(rng, max(10, int(rng.gamma(1.5, 200.0)))) for _ in range(nchunks)
    ]
    nchrom = max(4, int(rng.gamma(0.6, 25.0)))
    chroms = []
    for _ in range(nchrom):
        nc = max(4, int(rng.gamma(0.6, 25.0)))
        seq: List[int] = []
        for _ in range(nc):
            seq.extend(chunks[int(rng.integers(0, nchunks))])
        chroms.append(seq)
    return chroms
