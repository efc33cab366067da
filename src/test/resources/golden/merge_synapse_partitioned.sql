MERGE INTO test.table_a t
USING test.staged_a s
ON t.`ARCANE_MERGE_KEY` = s.`ARCANE_MERGE_KEY` AND t.`colA` IN ('v1', 'v2') AND (t.`colB` = s.`colB` OR s.`colB` IS NULL)
WHEN MATCHED AND coalesce(s.`IsDelete`, false) = true THEN DELETE
WHEN MATCHED AND coalesce(s.`IsDelete`, false) = false AND s.`versionnumber` > t.`versionnumber` THEN UPDATE SET t.`ARCANE_MERGE_KEY` = s.`ARCANE_MERGE_KEY`, t.`colA` = s.`colA`, t.`colB` = s.`colB`, t.`IsDelete` = s.`IsDelete`, t.`versionnumber` = s.`versionnumber`
WHEN NOT MATCHED AND coalesce(s.`IsDelete`, false) = false THEN INSERT (`ARCANE_MERGE_KEY`, `colA`, `colB`, `IsDelete`, `versionnumber`) VALUES (s.`ARCANE_MERGE_KEY`, s.`colA`, s.`colB`, s.`IsDelete`, s.`versionnumber`)