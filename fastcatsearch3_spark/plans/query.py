"""Query model + parser (SURVEY.md Q-1, Q-2).

The reference parses HTTP search params into a Query object tree
(core:ir.query.Query / Clause; server search action [K]). Our surface is a
small text grammar covering the same clause algebra:

    merge segment          → AND(merge, segment)           (AND is default)
    merge OR segment       → OR(merge, segment)
    merge -deprecated      → AND(merge) NOT(deprecated)
    parseIndexBuffer       → query-side analysis expands camelCase exactly
                             like the index side (same analyzer), so this
                             becomes AND(parse, index, buffer)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.functions.analyzer import tokenize_text


@dataclass
class ParsedQuery:
    terms: list[str]
    not_terms: list[str] = field(default_factory=list)
    op: str = "AND"  # AND | OR
    # synonym groups (F-6): groups[i] = tuple of EVERY group id terms[i]
    # belongs to (a term may be a member of several groups when it appears
    # both as a query word and as another word's synonym); None = no
    # expansion. Under AND, a group matches if ANY member term matches —
    # the flat form of the reference's query-side AND(OR(syn…)) expansion.
    groups: list[tuple[int, ...]] | None = None
    # minimum-should-match (reference clause-tree middle ground between OR
    # and AND): under OR, a doc must match ≥ msm distinct terms/groups.
    # Query syntax: a trailing `~N` token ("a b c ~2").
    msm: int | None = None
    # phrase constraints (J-5): each entry is a list of CONSECUTIVE terms
    # that must appear at adjacent positions ("\"exact phrase\"" syntax).
    # Phrase terms are also regular AND terms; the adjacency check is an
    # additional positional filter in the kernel.
    phrases: list[list[str]] = field(default_factory=list)
    # per-phrase proximity slop ('"a b"~2' syntax), aligned with phrases.
    # Semantics: the phrase matches at some start s iff term j occurs at a
    # position in [s+j, s+j+slop] for every j — an ordered window that
    # degrades gracefully to the exact phrase at slop=0 (for two terms
    # this is exactly "position difference in [1-slop, 1+slop]").
    phrase_slops: list[int] = field(default_factory=list)

    def __post_init__(self):
        if self.op not in ("AND", "OR"):
            raise ValueError(f"unsupported op: {self.op}")
        if self.phrases and not self.phrase_slops:
            self.phrase_slops = [0] * len(self.phrases)
        if len(self.phrase_slops) != len(self.phrases):
            raise ValueError("phrase_slops must align with phrases")
        if self.msm is not None and self.msm < 1:
            raise ValueError("msm must be >= 1")
        if self.groups is not None:
            if len(self.groups) != len(self.terms):
                raise ValueError("groups must align with terms")
            # normalize: ints → 1-tuples, lists → tuples
            self.groups = [
                (g,) if isinstance(g, int) else tuple(g) for g in self.groups
            ]

    @property
    def n_groups(self) -> int:
        if self.groups is None:
            return len(self.terms)
        return len({gid for gs in self.groups for gid in gs})


def parse_query(
    text: str,
    cfg: EngineConfig | None = None,
    synonyms: dict[str, list[str]] | None = None,
) -> ParsedQuery:
    """Parse + analyze a query string (Q-1 then Q-2: the query side runs
    the SAME analyzer as the index side — core:ir.analysis reuse [K]).
    ``synonyms`` maps an analyzed term to expansion words (each re-analyzed),
    mirroring the reference's query-side synonym dictionary
    (core:ir.analysis synonym term option [M])."""
    cfg = cfg or EngineConfig()
    import re as _re

    # phrase spans first: "exact phrase" → adjacency constraint (J-5);
    # '"a b"~2' → proximity with slop 2. The span's words also join the
    # regular term list (each its own group)
    phrases: list[list[str]] = []
    phrase_slops: list[int] = []
    phrase_words: list[str] = []
    for span, _tilde, slop in _re.findall(r'"([^"]*)"(~(\d+))?', text):
        ptoks: list[str] = []
        for w in span.split():
            ptoks.extend(tokenize_text(w, cfg))
        if len(ptoks) >= 2:
            phrases.append(ptoks)
            phrase_slops.append(int(slop) if slop else 0)
        phrase_words.extend(span.split())
    text = _re.sub(r'"[^"]*"(~\d+)?', " ", text)

    raw = text.split()
    op = "AND"
    msm: int | None = None
    pos_words: list[str] = []
    neg_words: list[str] = []
    for w in raw:
        m = _re.fullmatch(r"~(\d+)", w)
        if m:
            msm = int(m.group(1))  # minimum-should-match: "a b c ~2"
            op = "OR"  # msm only means anything over should-clauses
        elif w.upper() == "OR":
            op = "OR"
        elif w.upper() == "AND":
            op = "AND"
        elif w.startswith("-") and len(w) > 1:
            neg_words.append(w[1:])
        elif w.upper() == "NOT":
            neg_words.append("\0PENDING")
        else:
            if neg_words and neg_words[-1] == "\0PENDING":
                neg_words[-1] = w
            else:
                pos_words.append(w)
    neg_words = [w for w in neg_words if w != "\0PENDING"]
    pos_words = phrase_words + pos_words

    def analyze_word(w: str) -> tuple[str, list[str]]:
        """→ (term key prefix, analyzed tokens). "repo:spark" qualifies the
        token to the repo field — term key "repo:spark" (multi-index
        collections); the default content field stays bare."""
        if ":" in w:
            fld, rest = w.split(":", 1)
            if fld and rest:
                if fld not in cfg.indexed_fields:
                    raise ValueError(
                        f"unknown search field {fld!r} (indexed: "
                        f"{cfg.indexed_fields})"
                    )
                pref = "" if fld == "content" else f"{fld}:"
                return pref, tokenize_text(rest, cfg)
        return "", tokenize_text(w, cfg)

    terms: list[str] = []
    groups: list[int] = []
    gid = 0
    has_prefix = False
    for w in pos_words:
        if w.endswith("*") and len(w) > 1:
            # prefix (wildcard) term: "spar*" → placeholder "spar*" kept in
            # the term list; search_index expands it against the lexicon
            # into a synonym-style group (any expansion matches the group).
            # The stem runs the analyzer so query side == index side.
            pref, toks = analyze_word(w[:-1])
            if len(toks) != 1:
                raise ValueError(
                    f"prefix term {w!r} must analyze to one token, got {toks}"
                )
            terms.append(pref + toks[0] + "*")
            groups.append(gid)
            gid += 1
            has_prefix = True
            continue
        pref, toks = analyze_word(w)
        for t in toks:
            terms.append(pref + t)
            groups.append(gid)
            if synonyms and not pref and t in synonyms:
                for s in synonyms[t]:
                    for st in tokenize_text(s, cfg):
                        terms.append(st)
                        groups.append(gid)
            gid += 1
    nterms: list[str] = []
    for w in neg_words:
        if w.endswith("*") and len(w) > 1:
            raise ValueError("prefix terms are not supported in NOT clauses")
        pref, toks = analyze_word(w)
        nterms.extend(pref + t for t in toks)
    # de-dup, order-preserving (duplicate query terms score once, matching
    # set-semantics BM25 — and the DuckDB oracle's DISTINCT term list).
    # A term kept once must still credit EVERY group it belongs to (it may
    # be both a query word and another word's synonym), so group ids are
    # MERGED per term rather than first-wins.
    seen: dict[str, int] = {}
    dedup_terms: list[str] = []
    dedup_groups: list[tuple[int, ...]] = []
    for t, g in zip(terms, groups):
        if t in seen:
            prev = dedup_groups[seen[t]]
            if g not in prev:
                dedup_groups[seen[t]] = prev + (g,)
        else:
            seen[t] = len(dedup_terms)
            dedup_terms.append(t)
            dedup_groups.append((g,))
    nseen: set[str] = set()
    nterms = [t for t in nterms if not (t in nseen or nseen.add(t))]
    return ParsedQuery(
        terms=dedup_terms,
        not_terms=nterms,
        op=op,
        # prefix placeholders need group machinery even without synonyms
        groups=dedup_groups if (synonyms or has_prefix) else None,
        msm=msm,
        phrases=phrases,
        phrase_slops=phrase_slops,
    )
