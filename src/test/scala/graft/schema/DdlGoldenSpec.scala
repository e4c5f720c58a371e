package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.pgdump.PgDumpReader

/** Golden-DDL test (the reference's TestProcessPgDump_GetDDL technique,
  * pgdump_test.go:699): the full pretty DDL for the fixture, pinned
  * byte-for-byte — formatting (comment alignment, interleave order,
  * FK-alter placement) is part of the K4 contract. */
class DdlGoldenSpec extends AnyFunSuite {

  test("pretty DDL golden for the pg fixture") {
    val (_, plan) = PgDumpReader.schemaPass(
      "src/test/resources/fixtures/sample.pgdump")
    val ddl = DdlRender.schemaDdl(plan.spSchema,
      DdlRender.Config(comments = true)).mkString(";\n\n") + ";"
    val expected =
      """--
        |-- Spanner schema for source table inventory
        |--
        |CREATE TABLE inventory (
        |    sku STRING(MAX) NOT NULL,     -- From: sku text
        |    owner_id STRING(20) NOT NULL, -- From: owner_id varchar(20)
        |    qty INT64,                    -- From: qty bigint
        |    price NUMERIC,                -- From: price numeric(8,2)
        |    in_stock BOOL,                -- From: in_stock boolean
        |    weight FLOAT64,               -- From: weight float8
        |    added_at TIMESTAMP,           -- From: added_at timestamptz
        |    restock_on DATE,              -- From: restock_on date
        |    blob BYTES(MAX),              -- From: blob bytea
        |    tags ARRAY<STRING(MAX)>,      -- From: tags text[]
        |    counts ARRAY<INT64>           -- From: counts integer[]
        |) PRIMARY KEY (sku, owner_id);
        |
        |CREATE INDEX idx_qty ON inventory (qty);
        |
        |--
        |-- Spanner schema for source table order log
        |--
        |CREATE TABLE order_log (
        |    id INT64 NOT NULL,     -- From: id bigint
        |    order_ref STRING(MAX), -- From: order ref text
        |    note STRING(MAX)       -- From: note text
        |) PRIMARY KEY (id);
        |
        |--
        |-- Spanner schema for source table unkeyed
        |--
        |CREATE TABLE unkeyed (
        |    label STRING(MAX), -- From: label text
        |    hits INT64,        -- From: hits integer
        |    synth_id INT64
        |) PRIMARY KEY (synth_id);
        |
        |CREATE UNIQUE INDEX idx_label ON unkeyed (label);
        |
        |ALTER TABLE order_log ADD CONSTRAINT fk_sku FOREIGN KEY (order_ref) REFERENCES inventory (sku);""".stripMargin
    assert(ddl === expected)
  }
}
