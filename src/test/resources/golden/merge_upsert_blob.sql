MERGE INTO test.table_a t
USING test.staged_a s
ON t.`ARCANE_MERGE_KEY` = s.`ARCANE_MERGE_KEY`
WHEN MATCHED AND s.`createdon` > t.`createdon` THEN UPDATE SET t.`ARCANE_MERGE_KEY` = s.`ARCANE_MERGE_KEY`, t.`colA` = s.`colA`, t.`colB` = s.`colB`, t.`createdon` = s.`createdon`
WHEN NOT MATCHED THEN INSERT (`ARCANE_MERGE_KEY`, `colA`, `colB`, `createdon`) VALUES (s.`ARCANE_MERGE_KEY`, s.`colA`, s.`colB`, s.`createdon`)