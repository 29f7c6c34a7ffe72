#!/bin/sh
# Regenerates the SQLite test fixtures under src/test/resources/sqlite/.
# Requires the sqlite3 CLI. The fixtures are committed, so this only needs
# re-running to change a scenario. Each file targets a specific corner of
# the public file format (sqlite.org/fileformat2.html) that
# graft.sources.SqliteFile must handle.
set -e
dir="$(dirname "$0")/../src/test/resources/sqlite"
rm -f "$dir"/*.db*
# types.db: every serial type, rowid alias, overflow payloads, NULLs,
# int-width ladder (1..8 byte twos-complement), floats, blobs, ALTER TABLE
# ADD COLUMN (short records), defaults.
sqlite3 "$dir/types.db" <<'SQL'
CREATE TABLE t (
  id INTEGER PRIMARY KEY,
  i  INTEGER,
  r  REAL,
  s  TEXT,
  b  BLOB,
  n  NUMERIC
);
INSERT INTO t VALUES (1, 0, 0.0, '', x'', 0);
INSERT INTO t VALUES (2, 1, 1.5, 'one', x'01', 1.25);
INSERT INTO t VALUES (3, -1, -2.75, 'minus', x'deadbeef', -3);
INSERT INTO t VALUES (4, 127, 3.14159265358979, 'café → 値', x'00ff', 42);
INSERT INTO t VALUES (5, 128, -0.0, 'two-byte int follows', NULL, NULL);
INSERT INTO t VALUES (6, 32767, NULL, NULL, x'0102030405', 7);
INSERT INTO t VALUES (7, 32768, 1e300, 'three-byte', NULL, NULL);
INSERT INTO t VALUES (8, 8388607, -1e-300, NULL, NULL, NULL);
INSERT INTO t VALUES (9, 8388608, NULL, 'four-byte', NULL, NULL);
INSERT INTO t VALUES (10, 2147483647, NULL, NULL, NULL, NULL);
INSERT INTO t VALUES (11, 2147483648, NULL, 'six-byte', NULL, NULL);
INSERT INTO t VALUES (12, 140737488355327, NULL, NULL, NULL, NULL);
INSERT INTO t VALUES (13, 140737488355328, NULL, 'eight-byte', NULL, NULL);
INSERT INTO t VALUES (14, 9223372036854775807, NULL, NULL, NULL, NULL);
INSERT INTO t VALUES (15, -9223372036854775808, NULL, NULL, NULL, NULL);
-- overflow: payload far beyond one 4096-byte page
INSERT INTO t VALUES (16, NULL, NULL, replace(hex(zeroblob(6000)), '00', 'ab'), zeroblob(20000), NULL);
-- negative rowid + gap
INSERT INTO t VALUES (-5, 5, 5.5, 'neg rowid', NULL, 5);
INSERT INTO t VALUES (1000000, NULL, NULL, 'rowid gap', NULL, NULL);
ALTER TABLE t ADD COLUMN added TEXT DEFAULT 'dflt';
INSERT INTO t (id, i, added) VALUES (17, 99, 'explicit');
SQL
# deep.db: 512-byte pages + 40k rows -> a 3+ level table b-tree (partition
# fan-out test); deletions afterwards populate the freelist.
sqlite3 "$dir/deep.db" <<'SQL'
PRAGMA page_size=512;
CREATE TABLE big (k INTEGER PRIMARY KEY, v TEXT, w INTEGER);
WITH RECURSIVE c(x) AS (SELECT 1 UNION ALL SELECT x+1 FROM c WHERE x < 40000)
INSERT INTO big SELECT x, 'row-' || x, x * 3 FROM c;
DELETE FROM big WHERE k % 7 = 0;
CREATE INDEX big_w ON big(w);
SQL
# utf16.db: UTF-16le text encoding.
sqlite3 "$dir/utf16.db" <<'SQL'
PRAGMA encoding='UTF-16le';
CREATE TABLE u (id INTEGER PRIMARY KEY, s TEXT);
INSERT INTO u VALUES (1, 'plain'), (2, 'çédille'), (3, '値段😀');
SQL
# worowid.db: WITHOUT ROWID table (clustered-index storage the reader must
# reject loudly) alongside a normal table it must still read.
sqlite3 "$dir/worowid.db" <<'SQL'
CREATE TABLE wr (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID;
INSERT INTO wr VALUES ('a', 1), ('b', 2);
CREATE TABLE ok (k INTEGER PRIMARY KEY, v TEXT);
INSERT INTO ok VALUES (1, 'fine');
SQL
# virtual.db: CREATE VIRTUAL TABLE rows carry type='table' with rootpage 0;
# the reader must mark them unsupported (attach-all skips with a warning)
# while still reading the normal sibling AND the module's shadow tables.
sqlite3 "$dir/virtual.db" <<'SQL'
CREATE VIRTUAL TABLE ft USING fts4(content);
INSERT INTO ft VALUES ('hello world'), ('spark engine');
CREATE TABLE plain (k INTEGER PRIMARY KEY, v TEXT);
INSERT INTO plain VALUES (1, 'real');
SQL
# wal.db: WAL-mode db, fully checkpointed, with the header-only -wal
# sidecar still in place — the common at-rest state of a WAL db whose
# writer checkpointed (TRUNCATE) but did not unlink the sidecar. The
# reader must accept it (reference parity: sqlite_scanner reads it).
# Copied while the CLI connection is open so both files are
# CLI-produced, byte-for-byte.
( cd "$dir" && rm -f wal.db* tmp_wal.db* && sqlite3 tmp_wal.db <<'SQL'
PRAGMA journal_mode=WAL;
CREATE TABLE w (k INTEGER PRIMARY KEY, v TEXT);
INSERT INTO w VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma');
PRAGMA wal_checkpoint(TRUNCATE);
.system cp tmp_wal.db wal.db && cp tmp_wal.db-wal wal.db-wal
SQL
rm -f tmp_wal.db* )
# hotwal.db: WAL-mode db copied with PENDING (non-checkpointed) frames —
# the torn-snapshot case the reader must keep rejecting loudly.
( cd "$dir" && rm -f hotwal.db* tmp_hot.db* && sqlite3 tmp_hot.db <<'SQL'
PRAGMA journal_mode=WAL;
CREATE TABLE h (k INTEGER PRIMARY KEY, v TEXT);
INSERT INTO h VALUES (1, 'pending');
.system cp tmp_hot.db hotwal.db && cp tmp_hot.db-wal hotwal.db-wal
SQL
rm -f tmp_hot.db* )
