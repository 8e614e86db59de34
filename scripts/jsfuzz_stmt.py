"""Statement-level differential fuzzer for the minijs plugin VM:
generate small ES5 PROGRAMS (var decls, if/for, function declarations
+ calls, try/throw/catch, postfix ++/--, array sort/join), run each in
node AND minijs, compare a per-variable String checksum. minijs runs
FIRST so its op budget filters non-terminating programs before the
batched node pass. Usage: python scripts/jsfuzz_stmt.py [seed].
Generated names are globally unique: same-named function declarations
in sibling blocks intentionally are NOT generated, because node's
Annex B block-function semantics differ from pure ES5 hoisting there
(minijs follows ES5 / otto: function-scope binding, last declaration
wins)."""
import json
import os
import subprocess
import sys
import tempfile

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from thecrowler_ray.minijs import run_script, MiniJsError, MiniJsBudgetError
import random

rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
_uid = [0]


def uid():
    _uid[0] += 1
    return _uid[0]

NUMS = ["0", "1", "2", "3", "-1", "5", "0.5", "10"]
STRS = ["'a'", "'b'", "''", "'x1'"]


def expr(vars_, depth=0, wr=None):
    r = rng.random()
    if depth > 2 or r < 0.3:
        pool = NUMS + STRS + (vars_ * 2 if vars_ else [])
        return rng.choice(pool)
    if r < 0.6:
        op = rng.choice(["+", "-", "*", "%", "<", ">", "==", "===",
                         "&&", "||", "&", "|", "^"])
        return f"({expr(vars_, depth+1, wr)} {op} {expr(vars_, depth+1, wr)})"
    if r < 0.7:
        return f"({rng.choice(['!', '-', '~'])}({expr(vars_, depth+1, wr)}))"
    if r < 0.8 and (wr or vars_):
        v = rng.choice(wr if wr is not None else vars_)
        return f"({v} {rng.choice(['++', '--'])})".replace(
            f"({v} ++)", f"({v}++)").replace(f"({v} --)", f"({v}--)")
    if r < 0.9:
        return f"[{expr(vars_, depth+1, wr)}, {expr(vars_, depth+1, wr)}]" \
               f"[{rng.choice(['0', '1', '2'])}]"
    return f"({expr(vars_, depth+1, wr)} ? {expr(vars_, depth+1, wr)} " \
           f": {expr(vars_, depth+1, wr)})"


def gen_stmts(vars_, depth=0, wr=None, budget=None):
    if wr is None:
        wr = vars_
    out = []
    n = rng.randint(1, 4 if depth == 0 else 2)
    for _ in range(n):
        r = rng.random()
        if r < 0.30 or not wr:
            v = f"v{uid()}"
            out.append(f"var {v} = {expr(vars_, wr=wr)};")
            vars_.append(v)
            wr.append(v) if wr is not vars_ else None
        elif r < 0.5:
            out.append(f"{rng.choice(wr)} = {expr(vars_, wr=wr)};")
        elif r < 0.62 and depth < 2:
            body = gen_stmts(list(vars_), depth + 1, wr=list(wr))
            els = (" else { " + " ".join(gen_stmts(list(vars_), depth + 1,
                                                   wr=list(wr)))
                   + " }") if rng.random() < 0.5 else ""
            out.append(f"if ({expr(vars_, wr=wr)}) {{ {' '.join(body)} }}{els}")
        elif r < 0.74 and depth < 2:
            i = f"i{uid()}"
            body = gen_stmts(list(vars_) + [i], depth + 1, wr=list(wr))
            out.append(f"for (var {i} = 0; {i} < {rng.randint(1, 4)}; "
                       f"{i}++) {{ {' '.join(body)} }}")
        elif r < 0.84 and depth < 2:
            v = rng.choice(wr)
            body = gen_stmts(list(vars_), depth + 1, wr=list(wr))
            out.append(f"try {{ {' '.join(body)} if ({expr(vars_, wr=wr)}) "
                       f"throw {expr(vars_, wr=wr)}; }} "
                       f"catch (e) {{ {v} = ('' + e).length; }}")
        elif r < 0.94 and depth < 2:
            v = rng.choice(wr)
            fname = f"f{uid()}"
            fbody = gen_stmts(list(vars_) + ["p"], depth + 1,
                              wr=["p"] + list(wr))
            out.append(
                f"function {fname}(p) {{ {' '.join(fbody)} "
                f"return {expr(list(vars_) + ['p'])}; }} "
                f"{v} = {fname}({expr(vars_, wr=wr)});")
        elif r < 0.96 or depth >= 2:
            v = rng.choice(wr)
            out.append(f"{v} = [{', '.join(expr(vars_) for _ in range(3))}]"
                       f".sort().join('|');")
        elif r < 0.98:
            # object literal + member writes + delete + `in` + JSON
            o = f"o{uid()}"
            v = rng.choice(wr)
            out.append(
                f"var {o} = {{a: {expr(vars_, wr=wr)}, "
                f"b: {expr(vars_, wr=wr)}}}; "
                f"{o}.{rng.choice(['a', 'b', 'c'])} = "
                f"{expr(vars_, wr=wr)}; "
                f"{o}['{rng.choice(['a', 'b', 'd'])}'] = "
                f"{expr(vars_, wr=wr)}; "
                f"delete {o}.{rng.choice(['a', 'b', 'd'])}; "
                f"{v} = ('' + {o}.a) + ('b' in {o}) + "
                f"JSON.stringify({o});")
        elif r < 0.985:
            # for-in accumulation over a small object
            o = f"o{uid()}"
            k = f"k{uid()}"
            v = rng.choice(wr)
            out.append(
                f"var {o} = {{x: {expr(vars_, wr=wr)}, "
                f"y: {expr(vars_, wr=wr)}, z: 1}}; "
                f"{v} = ''; for (var {k} in {o}) "
                f"{{ {v} += {k} + ':' + {o}[{k}] + ';'; }}")
        elif r < 0.992:
            # method call: this-bound vs extracted-and-rebound
            o = f"o{uid()}"
            g = f"g{uid()}"
            v = rng.choice(wr)
            out.append(
                f"var {o} = {{n: {expr(vars_, wr=wr)}, "
                f"f: function (q) {{ return '' + this.n + '/' + q; }}}}; "
                f"var {g} = {o}.f; "
                f"{v} = {o}.f({expr(vars_, wr=wr)}) + '|' + "
                f"{g}.call({{n: 'C'}}, {expr(vars_, wr=wr)}) + '|' + "
                f"(typeof {g}(1));")
        else:
            # bounded recursion through a closure over an outer var
            fn = f"r{uid()}"
            v = rng.choice(wr)
            out.append(
                f"function {fn}(n) {{ if (n <= 0) return '' + {v}; "
                f"return {fn}(n - 1) + n; }} "
                f"{v} = {fn}({rng.randint(1, 5)});")
    return out


def gen_program():
    vars_ = []
    stmts = gen_stmts(vars_)
    sig = " + '|' + ".join(
        f"String({v})" for v in vars_) if vars_ else "'none'"
    return "\n".join(stmts) + f"\nresult = {sig};\n", vars_


def node_batch(progs):
    parts = ["var outs = [];"]
    for i, p in enumerate(progs):
        parts.append(
            "outs.push((function(){ try { var result;\n" + p +
            "\nreturn String(result); } catch (e) { return 'ERR'; } })());")
    parts.append("console.log(JSON.stringify(outs));")
    with tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f:
        f.write("\n".join(parts))
        path = f.name
    r = subprocess.run(["node", path], capture_output=True, text=True,
                       timeout=120)
    os.unlink(path)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[:500])
    return json.loads(r.stdout.strip())


N = 1500
progs = [gen_program()[0] for _ in range(N)]
# run minijs FIRST: its op budget marks non-terminating / explosive
# programs, which would hang the node batch — skip those
mini_res = []
kept = []
skipped = 0
import signal


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout


signal.signal(signal.SIGALRM, _alarm)
for p in progs:
    try:
        signal.alarm(3)  # ops stay bounded but strings can double per
        # op (v = v + v in a loop): wall-clock guard catches those
        mini_res.append(str(run_script(p, max_ops=300_000)))
        kept.append(p)
    except (MiniJsBudgetError, _Timeout):
        skipped += 1
    except MiniJsError as ex:
        mini_res.append("ERR")
        kept.append(p)
    except Exception as ex:
        mini_res.append(f"CRASH {type(ex).__name__}: {ex}")
        kept.append(p)
    finally:
        signal.alarm(0)
node_out = node_batch(kept)
bad = 0
shown = 0
for p, nv, mv in zip(kept, node_out, mini_res):
    if mv != nv:
        bad += 1
        if shown < 8:
            shown += 1
            print(f"=== PROGRAM\n{p}  node: {nv!r}\n  mini: {mv!r}\n")
print(f"{bad}/{len(kept)} mismatches ({skipped} skipped on op budget)")
