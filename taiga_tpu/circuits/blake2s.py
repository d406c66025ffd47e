"""In-circuit Blake2s-256 and the resource-logic commitment gadget.

Re-expresses /root/reference/taiga_halo2/src/circuit/blake2s.rs (1220 LoC of
spread/xor plonk gates) on this framework's standard config: 32-bit words are
32 boolean advice cells (8 bit lanes x 4 rows, LSB first), XOR is the shared
`q_xor` row gate, word recomposition is the one-row `q_recomp` gate, and
modular 2^32 addition is a field add followed by a fresh bit decomposition
with explicit carry bits. Rotations re-index bit cells (zero rows).

Used for:
  * ResourceLogicCommitment in-circuit: Blake2s-256(person="VPCommit",
    logic_vk.to_repr() || rcm.to_repr()) -> two 128-bit limbs
    (blake2s.rs:23-35 resource_logic_commitment_gadget);
  * the compliance circuit's input/output RL commitments
    (compliance_circuit.rs:281-324);
  * publicize_default_dynamic_resource_logic_commitments (blake2s.rs:37-78).

Field decomposition into bytes includes the canonicity check (bits encode the
UNIQUE little-endian representation < p), mirroring the reference's
field-decomposition soundness: p = 2^254 + T with T < 2^126, so a 255-bit
decomposition is canonical iff b255 = 0 and, when b254 = 1, bits 126..253 are
zero and the low 126 bits are <= T - 1 (checked with a borrow witness).
"""

from __future__ import annotations

from ..crypto.fields import Fp
from ..plonk.circuit import CircuitBuilder
from . import gadgets as G

P = Fp.MODULUS
MASK32 = 0xFFFFFFFF

IV = [
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
]

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


class Word:
    """A 32-bit word in-circuit: either a compile-time constant (no cells) or
    32 boolean bit cells (LSB first) with an optional cached field cell."""

    __slots__ = ("const", "bits", "cell")

    def __init__(self, const=None, bits=None, cell=None):
        self.const = const
        self.bits = bits
        self.cell = cell

    @property
    def value(self):
        """Known integer value (None in keygen mode for witness words)."""
        if self.const is not None:
            return self.const
        if self.bits[0].value is None:
            return None
        return sum((b.value & 1) << i for i, b in enumerate(self.bits))


def _bit_vals(v, n=32):
    if v is None:
        return [None] * n
    return [(v >> i) & 1 for i in range(n)]


def bits_region(b: CircuitBuilder, values, with_recomp=True, boolean=True):
    """Fresh 32-bit witness region: 4 rows x 8 bit lanes (+q_bits), with the
    q_recomp word cell on the first row. values: int | None. Returns Word."""
    rows = b.alloc_rows(4)
    bvs = _bit_vals(values)
    bits = []
    for j in range(4):
        if boolean:
            b.assign_fixed(G.Q_BITS, rows + j, 1)
        for i in range(8):
            bits.append(b.assign_advice(G.BIT_COLS[i], rows + j, bvs[8 * j + i]))
    cell = None
    if with_recomp:
        b.assign_fixed(G.Q_RECOMP, rows, 1)
        cell = b.assign_advice(G.WORD_COL, rows, values)
    return Word(bits=bits, cell=cell)


def copy_bits_region(b: CircuitBuilder, src_bits):
    """Copy 32 existing bit cells into a fresh q_recomp region -> word cell."""
    rows = b.alloc_rows(4)
    b.assign_fixed(G.Q_RECOMP, rows, 1)
    val = 0
    known = all(c.value is not None for c in src_bits)
    for j in range(4):
        for i in range(8):
            src = src_bits[8 * j + i]
            cell = b.assign_advice(G.BIT_COLS[i], rows + j, src.value)
            b.copy(cell, src)
            if known:
                val |= (src.value & 1) << (8 * j + i)
    wcell = b.assign_advice(G.WORD_COL, rows, val if known else None)
    return wcell


def to_cell(b: CircuitBuilder, w: Word):
    """Materialize the word's field cell."""
    if w.const is not None:
        if w.cell is None:
            w.cell = G.constant_cell(b, w.const)
        return w.cell
    if w.cell is None:
        w.cell = copy_bits_region(b, w.bits)
    return w.cell


def const_not_bit(b: CircuitBuilder, one_cell, x):
    """1 - x in one vanilla row."""
    return G.sub_cells(b, one_cell, x)


def xor_words(b: CircuitBuilder, x: Word, y: Word, one_cell=None) -> Word:
    """z = x ^ y. Bits x bits uses the q_xor gate (12 rows); a constant side
    folds to bit passthrough/NOT."""
    if x.const is not None and y.const is not None:
        return Word(const=x.const ^ y.const)
    if x.const is not None:
        x, y = y, x
    if y.const is not None:
        # x: bits, y: const -> per-bit passthrough / NOT
        assert one_cell is not None
        out = []
        for i, bit in enumerate(x.bits):
            if (y.const >> i) & 1:
                out.append(const_not_bit(b, one_cell, bit))
            else:
                out.append(bit)
        return Word(bits=out)
    # bits ^ bits: 4 chunks x 3 rows
    zbits = []
    for j in range(4):
        rows = b.alloc_rows(3)
        b.assign_fixed(G.Q_XOR, rows, 1)
        for i in range(8):
            xb = x.bits[8 * j + i]
            yb = y.bits[8 * j + i]
            cx = b.assign_advice(G.BIT_COLS[i], rows, xb.value)
            cy = b.assign_advice(G.BIT_COLS[i], rows + 1, yb.value)
            b.copy(cx, xb)
            b.copy(cy, yb)
            zv = None if xb.value is None or yb.value is None else (xb.value ^ yb.value)
            zbits.append(b.assign_advice(G.BIT_COLS[i], rows + 2, zv))
    return Word(bits=zbits)


def rotr(w: Word, n: int) -> Word:
    """Rotate right by n (free: bit re-indexing / constant fold)."""
    if w.const is not None:
        return Word(const=((w.const >> n) | (w.const << (32 - n))) & MASK32)
    return Word(bits=[w.bits[(i + n) % 32] for i in range(32)])


def add_words(b: CircuitBuilder, words: list[Word]) -> Word:
    """Sum mod 2^32. Field-adds the word cells, then freshly decomposes into
    32 result bits + carry bits with the recomposition constraint."""
    const_acc = 0
    n_terms = len(words)
    cells = []
    for w in words:
        if w.const is not None:
            const_acc += w.const
        else:
            cells.append(to_cell(b, w))
    assert cells, "all-constant add should be folded by the caller"
    # chain: sum = c0 + c1 + ... + const
    acc = cells[0]
    for c in cells[1:]:
        acc = G.add_cells(b, acc, c)
    if const_acc:
        ca, _, cc = G.assign_vanilla(
            b, ql=1, qc=const_acc % P, qo=P - 1, va=acc.value,
            vc=None if acc.value is None else (acc.value + const_acc) % P,
        )
        b.copy(ca, acc)
        acc = cc
    total = acc.value
    n_carry = max(1, (n_terms - 1).bit_length())
    lo = None if total is None else total & MASK32
    out = bits_region(b, lo)
    # carry bits row
    crow = b.alloc_rows(1)
    b.assign_fixed(G.Q_BITS, crow, 1)
    carry_cells = []
    cv = None if total is None else (total >> 32)
    for i in range(n_carry):
        bv = None if cv is None else (cv >> i) & 1
        carry_cells.append(b.assign_advice(G.BIT_COLS[i], crow, bv))
    # constrain acc == word + sum carry_i 2^(32+i)
    t = out.cell
    for i, cc_ in enumerate(carry_cells):
        t = G.add_scaled(b, t, cc_, 1 << (32 + i))
    G.assert_equal(b, t, acc)
    return out


def g_mix(b: CircuitBuilder, v, a, bb, c, d, x: Word, y: Word, one_cell):
    """The Blake2s G function on state list v (indices a,bb,c,d)."""
    v[a] = add_words(b, [v[a], v[bb], x])
    v[d] = rotr(xor_words(b, v[d], v[a], one_cell), 16)
    v[c] = add_words(b, [v[c], v[d]])
    v[bb] = rotr(xor_words(b, v[bb], v[c], one_cell), 12)
    v[a] = add_words(b, [v[a], v[bb], y])
    v[d] = rotr(xor_words(b, v[d], v[a], one_cell), 8)
    v[c] = add_words(b, [v[c], v[d]])
    v[bb] = rotr(xor_words(b, v[bb], v[c], one_cell), 7)


def compress(b: CircuitBuilder, h: list[Word], m: list[Word], t: int, last: bool,
             one_cell) -> list[Word]:
    """One Blake2s compression (10 rounds). h may contain ConstWords."""
    v = list(h) + [Word(const=IV[i]) for i in range(8)]
    v[12] = xor_words(b, v[12], Word(const=t & MASK32), one_cell)
    v[13] = xor_words(b, v[13], Word(const=(t >> 32) & MASK32), one_cell)
    if last:
        v[14] = xor_words(b, v[14], Word(const=MASK32), one_cell)
    for r in range(10):
        s = SIGMA[r]
        g_mix(b, v, 0, 4, 8, 12, m[s[0]], m[s[1]], one_cell)
        g_mix(b, v, 1, 5, 9, 13, m[s[2]], m[s[3]], one_cell)
        g_mix(b, v, 2, 6, 10, 14, m[s[4]], m[s[5]], one_cell)
        g_mix(b, v, 3, 7, 11, 15, m[s[6]], m[s[7]], one_cell)
        g_mix(b, v, 0, 5, 10, 15, m[s[8]], m[s[9]], one_cell)
        g_mix(b, v, 1, 6, 11, 12, m[s[10]], m[s[11]], one_cell)
        g_mix(b, v, 2, 7, 8, 13, m[s[12]], m[s[13]], one_cell)
        g_mix(b, v, 3, 4, 9, 14, m[s[14]], m[s[15]], one_cell)
    return [
        xor_words(b, xor_words(b, v[i], v[i + 8], one_cell), h[i], one_cell)
        for i in range(8)
    ]


# --- field element <-> words -------------------------------------------------

# p = 2^254 + T_LOW, T_LOW < 2^126
T_LOW = P - (1 << 254)
assert T_LOW < (1 << 126)


def field_to_words(b: CircuitBuilder, cell, one_cell) -> list[Word]:
    """Decompose a field cell into 8 little-endian 32-bit words with the
    canonicity (< p) check. ~90 rows."""
    v = cell.value
    words = [bits_region(b, None if v is None else (v >> (32 * j)) & MASK32)
             for j in range(8)]
    # recomposition: cell == sum words[j] * 2^(32 j)
    acc = words[0].cell
    for j in range(1, 8):
        acc = G.add_scaled(b, acc, words[j].cell, 1 << (32 * j))
    G.assert_equal(b, acc, cell)

    # canonicity: b255 == 0; if b254 == 1 then bits 126..253 all zero and
    # low 126 bits <= T_LOW - 1 (borrow witness range-checked to 126 bits).
    w7bits = words[7].bits
    b254, b255 = w7bits[30], w7bits[31]
    G.assert_equal_constant(b, b255, 0)
    hi = b254
    # words 4..6 zero when hi: hi * w_j == 0
    for j in (4, 5, 6):
        z = G.mul_cells(b, hi, words[j].cell)
        G.assert_equal_constant(b, z, 0)
    # w7 low 30 bits zero when hi: w7 == hi*2^30 + b255*2^31 + low30; b255=0
    # => low30 = w7 - hi*2^30; constrain hi * low30 == 0
    low30 = G.add_scaled(b, words[7].cell, hi, P - (1 << 30))
    z = G.mul_cells(b, hi, low30)
    G.assert_equal_constant(b, z, 0)
    # w3 top two bits (bits 126,127) zero when hi
    t2 = G.add_scaled(b, words[3].bits[30], words[3].bits[31], 2)
    z = G.mul_cells(b, hi, t2)
    G.assert_equal_constant(b, z, 0)
    # borrow check: d = hi * (T_LOW - 1 - lo128); lo128 = w0..w3 combined.
    lo = words[0].cell
    for j in (1, 2, 3):
        lo = G.add_scaled(b, lo, words[j].cell, 1 << (32 * j))
    # t = T_LOW - 1 - lo
    tv = None if lo.value is None else (T_LOW - 1 - lo.value) % P
    ca, _, tcell = G.assign_vanilla(b, ql=P - 1, qc=(T_LOW - 1) % P, qo=P - 1,
                                    va=lo.value, vc=tv)
    b.copy(ca, lo)
    d = G.mul_cells(b, hi, tcell)
    # range check d to 126 bits: 3 full words + one 30-bit word
    dv = d.value
    dws = [bits_region(b, None if dv is None else (dv >> (32 * j)) & MASK32)
           for j in range(4)]
    G.assert_equal_constant(b, dws[3].bits[30], 0)
    G.assert_equal_constant(b, dws[3].bits[31], 0)
    dacc = dws[0].cell
    for j in range(1, 4):
        dacc = G.add_scaled(b, dacc, dws[j].cell, 1 << (32 * j))
    G.assert_equal(b, dacc, d)
    return words


def words_to_u128_cell(b: CircuitBuilder, words: list[Word]):
    """Combine 4 words (LE) into one field cell (a 128-bit limb)."""
    acc = to_cell(b, words[0])
    for j in range(1, 4):
        acc = G.add_scaled(b, acc, to_cell(b, words[j]), 1 << (32 * j))
    return acc


# --- the resource-logic commitment gadget -----------------------------------

# Blake2s parameter block word 0: digest_length=32, key=0, fanout=1, depth=1
_PARAM_W0 = 32 | (1 << 16) | (1 << 24)


def _personal_words(person: bytes) -> tuple[int, int]:
    person = person.ljust(8, b"\0")
    return (
        int.from_bytes(person[0:4], "little"),
        int.from_bytes(person[4:8], "little"),
    )


def blake2s_init_words(person: bytes) -> list[Word]:
    p6, p7 = _personal_words(person)
    h = [Word(const=IV[i]) for i in range(8)]
    h[0] = Word(const=IV[0] ^ _PARAM_W0)
    h[6] = Word(const=IV[6] ^ p6)
    h[7] = Word(const=IV[7] ^ p7)
    return h


def resource_logic_commitment_gadget(b: CircuitBuilder, logic_cell, rcm_cell,
                                     one_cell):
    """In-circuit ResourceLogicCommitment (resource_logic_commitment.rs:16-46
    semantics): Blake2s-256("VPCommit", logic.to_repr() || rcm.to_repr()),
    output as two 128-bit field limbs (lo, hi)."""
    h = blake2s_init_words(b"VPCommit")
    m = field_to_words(b, logic_cell, one_cell) + field_to_words(b, rcm_cell, one_cell)
    out = compress(b, h, m, t=64, last=True, one_cell=one_cell)
    lo = words_to_u128_cell(b, out[0:4])
    hi = words_to_u128_cell(b, out[4:8])
    return lo, hi
