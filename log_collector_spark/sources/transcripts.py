"""Deterministic synthetic transcripts generator (FIXTURES.md §1-2).

Produces the engine's primary input table
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` per the target spec's input_hint, with:

- Zipf-skewed conversation sizes (hot conversations exercise salted
  repartitioning),
- ``text`` in the reference DEMO-1 grok shape
  ``[logtype] [yyyy-MM-dd HH:mm:ss] {json}`` (reference README.md:60-87),
  plus ~2% malformed lines (parse-failure route), ~0.5% blank lines, and
  ~0.1% oversize lines (error route, DefaultFileReader.java:252-265),
- roles/tools drawn from the broadcast lookup tables (plus ~1% unknown roles
  for the left-join null path),
- rows SHUFFLED across conversations (stable ordering must be re-established
  by the engine, the analog of the reference's lexicographic file sort +
  sequential line order, DefaultFileReader.java:196-203).

Everything is generated with vectorized numpy from a fixed seed — same args →
byte-identical parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

GROK_EXPR = (
    r"\[%{NOTSPACE:logtype}\] "
    r"\[%{CUSTOM_TIMESTAMP_ISO8601:logtime;date;yyyy-MM-dd HH:mm:ss}\] "
    r"%{JSON:payload}"
)

ROLES = ["user", "assistant", "system", "tool"]
ROLE_LOOKUP_ROWS = [
    ("user", "human", True),
    ("assistant", "model", False),
    ("system", "control", False),
    ("tool", "machine", False),
]
TOOLS = ["bash", "read", "edit", "search", "browse", "none"]
TOOL_LOOKUP_ROWS = [
    ("bash", "exec", True),
    ("read", "fs", False),
    ("edit", "fs", True),
    ("search", "query", False),
    ("browse", "net", False),
    ("none", "none", False),
]
LOGTYPES = ["elk", "web", "api", "svc"]

OVERSIZE_TEXT_BYTES = 9000  # with max_size=8192 these route to 'errors'
DEFAULT_MAX_SIZE = 8192

BASE_EPOCH = 1700000000  # 2023-11-14T22:13:20Z


def conv_sizes(n_turns: int, rng: np.random.RandomState) -> np.ndarray:
    """Zipf-skewed conversation sizes summing to n_turns; the head
    conversation is 'hot' (~3-5% of all turns)."""
    hot = min(max(4, int(n_turns * 0.04)), n_turns)
    remaining = n_turns - hot
    sizes = [np.array([hot], dtype="int64")]
    while remaining > 0:
        draw = np.minimum(rng.zipf(1.4, size=max(1024, remaining // 4)), 200)
        cs = np.cumsum(draw)
        k = int(np.searchsorted(cs, remaining))
        if k >= len(draw):
            sizes.append(draw.astype("int64"))
            remaining -= int(cs[-1])
            continue
        take = draw[:k + 1].astype("int64")
        take[-1] -= int(cs[k]) - remaining
        if take[-1] == 0:
            take = take[:-1]
        sizes.append(take)
        remaining = 0
    return np.concatenate(sizes)


def generate_transcripts(n_turns: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    sizes = conv_sizes(n_turns, rng)
    n_convs = len(sizes)
    conv_idx = np.repeat(np.arange(n_convs), sizes)
    turn_idx = np.concatenate([np.arange(s) for s in sizes]).astype("int32")
    conv_ids = np.char.add("conv_", np.char.zfill(conv_idx.astype("U8"), 7))

    role_pick = rng.choice(len(ROLES), size=n_turns, p=[0.40, 0.40, 0.05, 0.15])
    roles = np.array(ROLES, dtype=object)[role_pick]
    unknown = rng.rand(n_turns) < 0.01
    roles[unknown] = "bot"  # not in role_lookup → left-join null path

    tool_pick = rng.choice(len(TOOLS), size=n_turns,
                           p=[0.15, 0.2, 0.1, 0.1, 0.05, 0.4])
    tools = np.array(TOOLS, dtype=object)[tool_pick]
    tools[rng.rand(n_turns) < 0.05] = None  # nullable per FIXTURES

    # monotone ts within conversation: conv start + cumulative gaps
    conv_start = BASE_EPOCH + rng.randint(0, 7 * 86400, size=n_convs)
    gaps = rng.randint(1, 45, size=n_turns)
    # cumulative within each conversation
    cum = np.cumsum(gaps)
    offsets = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    # within-conversation elapsed = global cumsum minus its value at conv start
    start_cum = np.repeat(np.concatenate([[0], cum])[offsets], sizes)
    within = cum - start_cum
    ts_sec = np.repeat(conv_start, sizes) + within
    ts = pd.to_datetime(ts_sec, unit="s", utc=True).tz_localize(None)

    # text: DEMO-1 shaped log line; vectorized "YYYY-MM-DD HH:MM:SS" via
    # datetime64 string cast (C-level), not per-row strftime
    logtypes = np.array(LOGTYPES, dtype=object)[rng.choice(len(LOGTYPES), n_turns)]
    iso = ts_sec.astype("datetime64[s]").astype("U19")
    tstr = np.char.replace(iso, "T", " ").astype(object)
    latency = rng.randint(1, 5000, size=n_turns)
    n_tokens = rng.randint(1, 800, size=n_turns)
    payload = ('{"turn":' + turn_idx.astype("U10").astype(object) +
               ',"tokens":' + n_tokens.astype("U10").astype(object) +
               ',"latency_ms":' + latency.astype("U10").astype(object) +
               ',"tool":"' + np.where(tools == None, "none", tools).astype("U16").astype(object) + '"}')  # noqa: E711
    text = ("[" + logtypes + "] [" + tstr + "] " + payload).astype(object)

    r = rng.rand(n_turns)
    malformed = r < 0.02
    blank = (r >= 0.02) & (r < 0.025)
    oversize = (r >= 0.025) & (r < 0.026)
    text[malformed] = np.char.add("corrupt#", np.arange(n_turns)[malformed].astype("U10")).astype(object)
    text[blank] = ""
    if oversize.any():
        big = "[big] [2023-11-15 00:00:00] " + '{"pad":"' + "x" * OVERSIZE_TEXT_BYTES + '"}'
        text[oversize] = big

    df = pd.DataFrame({
        "conv_id": pd.Series(conv_ids.astype(object)),
        "turn_idx": turn_idx,
        "role": pd.Series(roles, dtype=object),
        "text": pd.Series(text, dtype=object),
        "tool": pd.Series(tools, dtype=object),  # keeps None as null
        "ts": ts,
    })
    # shuffle row order (engine must restore (conv_id, turn_idx) ordering)
    perm = rng.permutation(n_turns)
    return df.iloc[perm].reset_index(drop=True)


def role_lookup_df() -> pd.DataFrame:
    return pd.DataFrame(ROLE_LOOKUP_ROWS,
                        columns=["role", "role_class", "is_human"])


def tool_lookup_df() -> pd.DataFrame:
    return pd.DataFrame(TOOL_LOOKUP_ROWS,
                        columns=["tool", "tool_category", "is_side_effecting"])


def write_transcripts(path: str, n_turns: int, seed: int = 42,
                      partitions: int | None = None) -> str:
    """Write the transcripts parquet (multi-file so Spark scans in parallel).
    Idempotent: skips when the marker for (n_turns, seed) already exists.

    File count scales with rows (~10k rows/file, 8..128) so task parallelism
    isn't capped below the core count — at sf0.1 (1.2M turns) that's 120
    scan/parse tasks, enough to saturate local[32] and to make the
    local[8]-vs-local[32] scaling comparison meaningful."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if partitions is None:
        partitions = max(8, min(128, n_turns // 10_000))
    marker = os.path.join(path, f"_GENERATED_{n_turns}_{seed}_{partitions}")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.endswith(".parquet") or f.startswith("_GENERATED_"):
            os.remove(os.path.join(path, f))
    df = generate_transcripts(n_turns, seed)
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()),
        ("tool", pa.string()), ("ts", pa.timestamp("us")),
    ])
    chunk = (len(df) + partitions - 1) // max(1, partitions)
    for i in range(0, max(1, partitions)):
        part = df.iloc[i * chunk:(i + 1) * chunk]
        if len(part) == 0:
            break
        tbl = pa.Table.from_pandas(part, schema=schema, preserve_index=False)
        pq.write_table(tbl, os.path.join(path, f"part-{i:04d}.parquet"))
    open(marker, "w").close()
    return path
