"""Public-suffix-list registered_domain (VERDICT r4 #8).

``registered_domain`` groups politeness / DUST / robots state by eTLD+1.
The round-4 implementation recognized 19 hard-coded two-label suffixes;
this module replaces it with a FROZEN SNAPSHOT of the public suffix
list's ICANN section (a documented subset — the sandbox has no network,
so the full https://publicsuffix.org/list/ file can't be fetched; drop
one in via ``load_psl_rules(open(path))`` to upgrade) evaluated by the
standard PSL algorithm: longest matching rule wins, exception (``!``)
rules beat wildcards, the registrable domain is the matched public
suffix plus one label.

Execution shape: the rule sets compile into PURE COLUMN EXPRESSIONS
(``isin`` over frozen literals → Catalyst ``InSet`` hash lookups inside
whole-stage codegen). This is strictly better than the broadcast-join
formulation at any scale — the table ships inside the plan, touches no
shuffle, and stays JVM-side; a PSL is ~10k rules, far under InSet's
practical limits. The pure-Python twin (``registered_domain_py``) feeds
the conformance oracle so engine == oracle over any host set.

Snapshot scope: country-code second-level registries (co.uk, com.au,
co.jp, …) for ~40 major ccTLDs, the Australian/UK three-label education
registries, the US k12/cc/lib state registries for the largest states,
and the PSL's documented wildcard/exception pair (``*.ck`` /
``!www.ck``). Unlisted TLDs fall back to the implicit ``*`` rule (last
label is the suffix) — exactly the PSL default.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

_SNAPSHOT = """
// crawlspark frozen PSL snapshot (ICANN-section subset; see module doc)
co.uk
ac.uk
gov.uk
org.uk
net.uk
sch.uk
nhs.uk
police.uk
ltd.uk
plc.uk
me.uk
co.jp
ne.jp
or.jp
ac.jp
ad.jp
ed.jp
go.jp
gr.jp
lg.jp
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
act.edu.au
nsw.edu.au
nt.edu.au
qld.edu.au
sa.edu.au
tas.edu.au
vic.edu.au
wa.edu.au
co.nz
net.nz
org.nz
govt.nz
ac.nz
school.nz
geek.nz
gen.nz
maori.nz
com.br
net.br
org.br
gov.br
edu.br
mil.br
art.br
blog.br
eco.br
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
mil.cn
co.in
net.in
org.in
firm.in
gen.in
ind.in
nic.in
ac.in
edu.in
res.in
gov.in
mil.in
co.kr
ne.kr
or.kr
re.kr
pe.kr
go.kr
mil.kr
ac.kr
hs.kr
ms.kr
es.kr
sc.kr
kg.kr
seoul.kr
busan.kr
co.za
net.za
org.za
gov.za
edu.za
ac.za
web.za
com.mx
net.mx
org.mx
gob.mx
edu.mx
com.tr
net.tr
org.tr
gov.tr
edu.tr
av.tr
bel.tr
biz.tr
dr.tr
gen.tr
info.tr
k12.tr
name.tr
pol.tr
tel.tr
tv.tr
web.tr
com.ar
net.ar
org.ar
gob.ar
edu.ar
int.ar
mil.ar
tur.ar
com.sg
net.sg
org.sg
gov.sg
edu.sg
per.sg
com.hk
net.hk
org.hk
gov.hk
edu.hk
idv.hk
com.tw
net.tw
org.tw
gov.tw
edu.tw
mil.tw
idv.tw
club.tw
game.tw
co.th
net.th
org.th
go.th
ac.th
in.th
mi.th
or.th
com.my
net.my
org.my
gov.my
edu.my
mil.my
name.my
co.id
net.id
or.id
go.id
ac.id
sch.id
web.id
my.id
biz.id
com.ph
net.ph
org.ph
gov.ph
edu.ph
ngo.ph
mil.ph
i.ph
com.vn
net.vn
org.vn
gov.vn
edu.vn
int.vn
ac.vn
biz.vn
info.vn
name.vn
pro.vn
health.vn
co.il
net.il
org.il
gov.il
ac.il
muni.il
idf.il
k12.il
com.pl
net.pl
org.pl
gov.pl
edu.pl
info.pl
waw.pl
com.ua
net.ua
org.ua
gov.ua
edu.ua
in.ua
kiev.ua
com.eg
net.eg
org.eg
gov.eg
edu.eg
eun.eg
sci.eg
mil.eg
name.eg
com.sa
net.sa
org.sa
gov.sa
edu.sa
med.sa
pub.sa
sch.sa
co.ae
net.ae
org.ae
gov.ae
ac.ae
sch.ae
mil.ae
com.ng
net.ng
org.ng
gov.ng
edu.ng
i.ng
mil.ng
mobi.ng
name.ng
sch.ng
co.ke
ne.ke
or.ke
go.ke
ac.ke
sc.ke
me.ke
mobi.ke
info.ke
k12.ca.us
k12.ny.us
k12.tx.us
k12.fl.us
k12.il.us
k12.pa.us
k12.oh.us
k12.ma.us
k12.wa.us
k12.mi.us
cc.ca.us
cc.ny.us
cc.tx.us
lib.ca.us
lib.ny.us
lib.tx.us
// wildcard + exception (the PSL's documented pair)
*.ck
!www.ck
"""


@dataclass(frozen=True)
class PslRules:
    """Parsed PSL rule sets, split by label count for the column-expr
    evaluator. ``wild`` holds wildcard PARENTS ('*.ck' → 'ck'); ``exc``
    holds exception rules with the '!' stripped ('!www.ck' → 'www.ck' —
    per spec the exception itself IS registrable)."""

    exact2: frozenset[str] = field(default_factory=frozenset)
    exact3: frozenset[str] = field(default_factory=frozenset)
    wild1: frozenset[str] = field(default_factory=frozenset)
    exc2: frozenset[str] = field(default_factory=frozenset)


def load_psl_rules(lines) -> PslRules:
    """Parse standard publicsuffix.org format (``//`` comments, ``*.``
    wildcards, ``!`` exceptions). Single-label exact rules are the
    implicit default and need no table; rules deeper than the evaluator
    supports (4+ labels, multi-label wildcard parents) raise so a
    swapped-in full list can't be silently mis-evaluated."""
    exact2, exact3, wild1, exc2 = set(), set(), set(), set()
    for raw in lines:
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            rule = line[1:]
            if rule.count(".") != 1:
                raise ValueError(f"unsupported exception depth: {line}")
            exc2.add(rule)
        elif line.startswith("*."):
            parent = line[2:]
            if "." in parent:
                raise ValueError(f"unsupported wildcard depth: {line}")
            wild1.add(parent)
        elif line.count(".") == 1:
            exact2.add(line)
        elif line.count(".") == 2:
            exact3.add(line)
        elif "." in line:
            raise ValueError(f"unsupported rule depth: {line}")
        # single-label exact rules == the implicit '*' default: skip
    return PslRules(
        frozenset(exact2), frozenset(exact3), frozenset(wild1), frozenset(exc2)
    )


SNAPSHOT_RULES = load_psl_rules(_SNAPSHOT.splitlines())


def registered_domain_expr(host: Column, rules: PslRules = SNAPSHOT_RULES) -> Column:
    """eTLD+1 as a pure column expression (InSet lookups, codegen'd).
    Hosts that ARE a public suffix (no registrable domain per spec) fall
    back to the host itself — the politeness bucket still exists."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    lastk = lambda k: F.concat_ws(
        ".", *[F.element_at(parts, -i) for i in range(k, 0, -1)]
    )
    last2, last3, last4 = lastk(2), lastk(3), lastk(4)
    out = F.when(n <= 1, host)
    if rules.exc2:
        # exception rule: the rule itself is the registrable domain
        out = out.when((n >= 2) & last2.isin(*rules.exc2), last2)
    if rules.exact3:
        hit3 = last3.isin(*rules.exact3)
        out = out.when((n >= 4) & hit3, last4).when((n == 3) & hit3, host)
    # wildcard '*.p': any '<label>.p' is a public suffix (same depth as
    # the exact2 rules; snapshot has no overlaps between the two sets)
    hit2 = F.element_at(parts, -1).isin(*rules.wild1) if rules.wild1 else F.lit(False)
    if rules.exact2:
        hit2 = hit2 | last2.isin(*rules.exact2)
    return (
        out.when((n >= 3) & hit2, last3)
        .when((n == 2) & hit2, host)
        .otherwise(last2)
    )


def registered_domain_py(host: str, rules: PslRules = SNAPSHOT_RULES) -> str:
    """Exact pure-Python twin of ``registered_domain_expr`` — feeds the
    conformance oracle and the property tests."""
    parts = host.split(".")
    n = len(parts)
    if n <= 1:
        return host
    last2 = ".".join(parts[-2:])
    if last2 in rules.exc2:
        return last2
    if n >= 3 and ".".join(parts[-3:]) in rules.exact3:
        return ".".join(parts[-4:]) if n >= 4 else host
    if parts[-1] in rules.wild1 or last2 in rules.exact2:
        return ".".join(parts[-3:]) if n >= 3 else host
    return last2
