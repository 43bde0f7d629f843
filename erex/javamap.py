"""Java HashMap iteration-order replica.

The reference enumerates timex pairs over
``doc.getEntities().keySet().toArray()`` (TempRelPro.java:64) — a
``java.util.HashMap`` whose iteration order is bucket order, not
insertion order.  The R1 timex algebra is order-asymmetric for the
PAST/PRESENT/FUTURE_REF era cases (TimexTimexRelationRule.java:195-245:
evaluating (REF, date) vs (date, REF) yields non-inverse results), so the
emitted T-T labels depend on that iteration order.  This module computes
it exactly for string keys by simulating ``java.util.HashMap`` (Java 8+)
put-by-put:

- ``String.hashCode`` = 31-polynomial over UTF-16 units, signed 32-bit;
- ``HashMap.hash`` spreads ``h ^ (h >>> 16)``;
- slot = spread & (capacity-1); default capacity 16, load factor 0.75,
  capacity doubling preserves relative order within the lo/hi splits;
- a bin receiving its 9th node treeifies (TREEIFY_THRESHOLD) — or, below
  MIN_TREEIFY_CAPACITY=64, forces an extra resize instead.  Treeified
  bins keep their next/prev linked list (which is what iteration walks),
  but ``moveRootToFront`` relinks the red-black root to the bin head and
  ``putTreeVal`` splices new nodes after their tree parent rather than at
  the tail, so iteration order inside big bins depends on the full
  red-black insertion/rotation history.  All of that is replicated below
  (tieBreakOrder via System.identityHashCode is unreachable for distinct
  String keys — compareTo breaks every hash tie — so the order is
  deterministic).  Validated key-for-key against a live JVM by
  tests/test_javaref_parity.py::test_javamap_matches_real_jvm_hashmap,
  including forced-collision treeified bins.
"""

from __future__ import annotations

_TREEIFY_THRESHOLD = 8
_UNTREEIFY_THRESHOLD = 6
_MIN_TREEIFY_CAPACITY = 64


def java_string_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h


def _hash_signed(key: str) -> int:
    """HashMap.hash(key) as a SIGNED 32-bit int (tree code compares
    hashes with signed <, and Python's & on negatives is two's-complement
    so slot masking still works)."""
    h = java_string_hash(key)
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def hashmap_capacity(n: int) -> int:
    """Final table capacity for n keys absent treeify-forced resizes."""
    cap = 16
    while n > int(cap * 0.75):
        cap *= 2
    return cap


class _Node:
    __slots__ = ("h", "key", "next", "prev", "left", "right", "parent",
                 "red", "tree")

    def __init__(self, h, key, nxt=None):
        self.h = h
        self.key = key
        self.next = nxt
        self.prev = None
        self.left = None
        self.right = None
        self.parent = None
        self.red = False
        self.tree = False


def _compare(k, pk) -> int:
    # String.compareTo by UTF-16 units; never 0 for distinct map keys,
    # so Java's identityHashCode tieBreakOrder is unreachable.
    if k == pk:
        raise AssertionError("duplicate key reached tree comparison")
    return -1 if k < pk else 1


def _rotate_left(root, p):
    if p is not None:
        r = p.right
        if r is not None:
            rl = r.left
            p.right = rl
            if rl is not None:
                rl.parent = p
            pp = p.parent
            r.parent = pp
            if pp is None:
                root = r
                r.red = False
            elif pp.left is p:
                pp.left = r
            else:
                pp.right = r
            r.left = p
            p.parent = r
    return root


def _rotate_right(root, p):
    if p is not None:
        l = p.left
        if l is not None:
            lr = l.right
            p.left = lr
            if lr is not None:
                lr.parent = p
            pp = p.parent
            l.parent = pp
            if pp is None:
                root = l
                l.red = False
            elif pp.right is p:
                pp.right = l
            else:
                pp.left = l
            l.right = p
            p.parent = l
    return root


def _balance_insertion(root, x):
    x.red = True
    while True:
        xp = x.parent
        if xp is None:
            x.red = False
            return x
        xpp = xp.parent
        if not xp.red or xpp is None:
            return root
        xppl = xpp.left
        if xp is xppl:
            xppr = xpp.right
            if xppr is not None and xppr.red:
                xppr.red = False
                xp.red = False
                xpp.red = True
                x = xpp
            else:
                if x is xp.right:
                    x = xp
                    root = _rotate_left(root, x)
                    xp = x.parent
                    xpp = xp.parent if xp is not None else None
                if xp is not None:
                    xp.red = False
                    if xpp is not None:
                        xpp.red = True
                        root = _rotate_right(root, xpp)
        else:
            if xppl is not None and xppl.red:
                xppl.red = False
                xp.red = False
                xpp.red = True
                x = xpp
            else:
                if x is xp.left:
                    x = xp
                    root = _rotate_right(root, x)
                    xp = x.parent
                    xpp = xp.parent if xp is not None else None
                if xp is not None:
                    xp.red = False
                    if xpp is not None:
                        xpp.red = True
                        root = _rotate_left(root, xpp)


def _balance_deletion(root, x):
    # HashMap.TreeNode.balanceDeletion (JDK 8)
    while True:
        if x is None or x is root:
            return root
        xp = x.parent
        if xp is None:
            x.red = False
            return x
        if x.red:
            x.red = False
            return root
        xpl = xp.left
        if xpl is x:
            xpr = xp.right
            if xpr is not None and xpr.red:
                xpr.red = False
                xp.red = True
                root = _rotate_left(root, xp)
                xp = x.parent
                xpr = None if xp is None else xp.right
            if xpr is None:
                x = xp
            else:
                sl, sr = xpr.left, xpr.right
                if (sr is None or not sr.red) and (sl is None or not sl.red):
                    xpr.red = True
                    x = xp
                else:
                    if sr is None or not sr.red:
                        if sl is not None:
                            sl.red = False
                        xpr.red = True
                        root = _rotate_right(root, xpr)
                        xp = x.parent
                        xpr = None if xp is None else xp.right
                    if xpr is not None:
                        xpr.red = False if xp is None else xp.red
                        sr = xpr.right
                        if sr is not None:
                            sr.red = False
                    if xp is not None:
                        xp.red = False
                        root = _rotate_left(root, xp)
                    x = root
        else:                                   # symmetric
            xpl = xp.left
            if xpl is not None and xpl.red:
                xpl.red = False
                xp.red = True
                root = _rotate_right(root, xp)
                xp = x.parent
                xpl = None if xp is None else xp.left
            if xpl is None:
                x = xp
            else:
                sl, sr = xpl.left, xpl.right
                if (sl is None or not sl.red) and (sr is None or not sr.red):
                    xpl.red = True
                    x = xp
                else:
                    if sl is None or not sl.red:
                        if sr is not None:
                            sr.red = False
                        xpl.red = True
                        root = _rotate_left(root, xpl)
                        xp = x.parent
                        xpl = None if xp is None else xp.left
                    if xpl is not None:
                        xpl.red = False if xp is None else xp.red
                        sl = xpl.left
                        if sl is not None:
                            sl.red = False
                    if xp is not None:
                        xp.red = False
                        root = _rotate_right(root, xp)
                    x = root


class _JavaHashMap:
    """put()/keys()/remove() subset of java.util.HashMap<String, ?>
    semantics."""

    def __init__(self):
        self.tab = None
        self.size = 0
        self.threshold = 0

    # -- HashMap.putVal ------------------------------------------------
    def put(self, key: str):
        h = _hash_signed(key)
        if self.tab is None:
            self._resize()
        tab = self.tab
        i = (len(tab) - 1) & h
        p = tab[i]
        if p is None:
            tab[i] = _Node(h, key)
        elif p.h == h and p.key == key:
            return
        elif p.tree:
            if self._put_tree_val(tab, p, h, key) is not None:
                return
        else:
            bin_count = 0
            while True:
                e = p.next
                if e is None:
                    p.next = _Node(h, key)
                    if bin_count >= _TREEIFY_THRESHOLD - 1:
                        self._treeify_bin(h)
                    break
                if e.h == h and e.key == key:
                    return
                p = e
                bin_count += 1
        self.size += 1
        if self.size > self.threshold:
            self._resize()

    def keys(self) -> list:
        out = []
        if self.tab:
            for e in self.tab:
                while e is not None:
                    out.append(e.key)
                    e = e.next
        return out

    # -- HashMap.removeNode ---------------------------------------------
    def remove(self, key: str):
        """HashMap.remove semantics. Removals never resize (the table
        keeps its full put-history capacity — the reason the MLN
        leftover pass must replay the whole put-then-remove history,
        not rebuild from the surviving keys). List bins unlink in
        place; tree bins go through removeTreeNode (untreeify below
        the root-shape threshold, else RB delete + moveRootToFront)."""
        h = _hash_signed(key)
        tab = self.tab
        if not tab:
            return
        index = (len(tab) - 1) & h
        p = tab[index]
        if p is None:
            return
        node = None
        if p.h == h and p.key == key:
            node = p
        else:
            e = p.next
            if e is not None:
                if p.tree:
                    node = self._get_tree_node(p, h, key)
                else:
                    while e is not None:
                        if e.h == h and e.key == key:
                            node = e
                            break
                        p = e
                        e = e.next
        if node is None:
            return
        if node.tree:
            self._remove_tree_node(tab, node)
        elif node is p:
            tab[index] = node.next
        else:
            p.next = node.next
        self.size -= 1

    # -- TreeNode.getTreeNode / find ------------------------------------
    @staticmethod
    def _get_tree_node(first, h, key):
        p = first
        while p.parent is not None:
            p = p.parent
        while p is not None:
            if p.h > h:
                p = p.left
            elif p.h < h:
                p = p.right
            elif p.key == key:
                return p
            elif p.left is None:
                p = p.right
            elif p.right is None:
                p = p.left
            else:
                # String keys are Comparable and never compare equal for
                # distinct keys, so the descent is always directed
                p = p.left if _compare(key, p.key) < 0 else p.right
        return None

    # -- TreeNode.removeTreeNode (movable=true) -------------------------
    def _remove_tree_node(self, tab, p):
        index = (len(tab) - 1) & p.h
        first = tab[index]
        root = first
        succ, pred = p.next, p.prev
        if pred is None:
            tab[index] = first = succ
        else:
            pred.next = succ
        if succ is not None:
            succ.prev = pred
        if first is None:
            return
        while root.parent is not None:
            root = root.parent
        rl = root.left
        if root.right is None or rl is None or rl.left is None:
            tab[index] = self._untreeify(first)   # too small: back to list
            return
        pl, pr = p.left, p.right
        if pl is not None and pr is not None:
            s = pr
            while s.left is not None:             # in-order successor
                s = s.left
            s.red, p.red = p.red, s.red           # swap colors
            sr = s.right
            pp = p.parent
            if s is pr:                           # p was s's direct parent
                p.parent = s
                s.right = p
            else:
                sp = s.parent
                p.parent = sp
                if sp is not None:
                    if s is sp.left:
                        sp.left = p
                    else:
                        sp.right = p
                s.right = pr
                pr.parent = s
            p.left = None
            p.right = sr
            if sr is not None:
                sr.parent = p
            s.left = pl
            pl.parent = s
            s.parent = pp
            if pp is None:
                root = s
            elif p is pp.left:
                pp.left = s
            else:
                pp.right = s
            replacement = sr if sr is not None else p
        elif pl is not None:
            replacement = pl
        elif pr is not None:
            replacement = pr
        else:
            replacement = p
        if replacement is not p:
            pp = replacement.parent = p.parent
            if pp is None:
                root = replacement
            elif p is pp.left:
                pp.left = replacement
            else:
                pp.right = replacement
            p.left = p.right = p.parent = None
        r = root if p.red else _balance_deletion(root, replacement)
        if replacement is p:                      # detach
            pp = p.parent
            p.parent = None
            if pp is not None:
                if p is pp.left:
                    pp.left = None
                elif p is pp.right:
                    pp.right = None
        self._move_root_to_front(tab, r)

    # -- HashMap.resize ------------------------------------------------
    def _resize(self):
        old_tab = self.tab
        old_cap = len(old_tab) if old_tab else 0
        if old_cap > 0:
            new_cap = old_cap << 1
            self.threshold <<= 1
        else:
            new_cap = 16
            self.threshold = 12
        new_tab = [None] * new_cap
        self.tab = new_tab
        for j in range(old_cap):
            e = old_tab[j]
            if e is None:
                continue
            old_tab[j] = None
            if e.next is None:
                new_tab[e.h & (new_cap - 1)] = e
            elif e.tree:
                self._split(new_tab, e, j, old_cap)
            else:                       # preserve order in lo/hi lists
                lo_head = lo_tail = hi_head = hi_tail = None
                while e is not None:
                    nxt = e.next
                    if (e.h & old_cap) == 0:
                        if lo_tail is None:
                            lo_head = e
                        else:
                            lo_tail.next = e
                        lo_tail = e
                    else:
                        if hi_tail is None:
                            hi_head = e
                        else:
                            hi_tail.next = e
                        hi_tail = e
                    e = nxt
                if lo_tail is not None:
                    lo_tail.next = None
                    new_tab[j] = lo_head
                if hi_tail is not None:
                    hi_tail.next = None
                    new_tab[j + old_cap] = hi_head

    # -- HashMap.treeifyBin -------------------------------------------
    def _treeify_bin(self, h):
        tab = self.tab
        n = len(tab)
        if n < _MIN_TREEIFY_CAPACITY:
            self._resize()
            return
        index = (n - 1) & h
        e = tab[index]
        if e is None:
            return
        tl = None
        while e is not None:            # replacementTreeNode chain
            e.tree = True
            e.prev = tl
            tl = e
            e = e.next
        self._treeify(tab, tab[index])

    # -- TreeNode.treeify ---------------------------------------------
    def _treeify(self, tab, head):
        root = None
        x = head
        while x is not None:
            nxt = x.next
            x.left = x.right = None
            if root is None:
                x.parent = None
                x.red = False
                root = x
            else:
                k, h = x.key, x.h
                p = root
                while True:
                    ph = p.h
                    if ph > h:
                        dir_ = -1
                    elif ph < h:
                        dir_ = 1
                    else:
                        dir_ = _compare(k, p.key)
                    xp = p
                    p = p.left if dir_ <= 0 else p.right
                    if p is None:
                        x.parent = xp
                        if dir_ <= 0:
                            xp.left = x
                        else:
                            xp.right = x
                        root = _balance_insertion(root, x)
                        break
            x = nxt
        self._move_root_to_front(tab, root)

    # -- TreeNode.moveRootToFront -------------------------------------
    def _move_root_to_front(self, tab, root):
        if root is None:
            return
        index = (len(tab) - 1) & root.h
        first = tab[index]
        if root is not first:
            tab[index] = root
            rp, rn = root.prev, root.next
            if rn is not None:
                rn.prev = rp
            if rp is not None:
                rp.next = rn
            if first is not None:
                first.prev = root
            root.next = first
            root.prev = None

    # -- TreeNode.putTreeVal ------------------------------------------
    def _put_tree_val(self, tab, first, h, k):
        root = first
        while root.parent is not None:
            root = root.parent
        p = root
        while True:
            ph = p.h
            pk = p.key
            if ph > h:
                dir_ = -1
            elif ph < h:
                dir_ = 1
            elif pk == k:
                return p
            else:
                dir_ = _compare(k, pk)
            xp = p
            p = p.left if dir_ <= 0 else p.right
            if p is None:
                xpn = xp.next
                x = _Node(h, k, xpn)
                x.tree = True
                if dir_ <= 0:
                    xp.left = x
                else:
                    xp.right = x
                xp.next = x             # splice after tree parent
                x.parent = x.prev = xp
                if xpn is not None:
                    xpn.prev = x
                self._move_root_to_front(tab, _balance_insertion(root, x))
                return None

    # -- TreeNode.split ------------------------------------------------
    def _split(self, tab, b, index, bit):
        lo_head = lo_tail = hi_head = hi_tail = None
        lc = hc = 0
        e = b
        while e is not None:
            nxt = e.next
            e.next = None
            if (e.h & bit) == 0:
                e.prev = lo_tail
                if lo_tail is None:
                    lo_head = e
                else:
                    lo_tail.next = e
                lo_tail = e
                lc += 1
            else:
                e.prev = hi_tail
                if hi_tail is None:
                    hi_head = e
                else:
                    hi_tail.next = e
                hi_tail = e
                hc += 1
            e = nxt
        if lo_head is not None:
            if lc <= _UNTREEIFY_THRESHOLD:
                tab[index] = self._untreeify(lo_head)
            else:
                tab[index] = lo_head
                if hi_head is not None:
                    self._treeify(tab, lo_head)
        if hi_head is not None:
            if hc <= _UNTREEIFY_THRESHOLD:
                tab[index + bit] = self._untreeify(hi_head)
            else:
                tab[index + bit] = hi_head
                if lo_head is not None:
                    self._treeify(tab, hi_head)

    @staticmethod
    def _untreeify(head):
        q = head
        while q is not None:
            q.tree = False
            q.prev = q.left = q.right = q.parent = None
            q = q.next
        return head


def java_hashmap_order(keys) -> list:
    """Keys in java.util.HashMap iteration order, given their insertion
    order (the iterable's own order)."""
    m = _JavaHashMap()
    for k in keys:
        m.put(k)
    return m.keys()


def java_hashmap_order_after_removals(keys, removed) -> list:
    """Iteration order after the FULL put-then-remove history: every key
    in `keys` inserted in order, then `removed` removed in order. The
    table capacity reflects ALL inserted keys (removals never shrink a
    JDK-8 HashMap), so this differs from java_hashmap_order(survivors)
    whenever the removed keys pushed the map past a resize threshold."""
    m = _JavaHashMap()
    for k in keys:
        m.put(k)
    for k in removed:
        m.remove(k)
    return m.keys()
