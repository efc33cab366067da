(SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY `ARCANE_MERGE_KEY` ORDER BY `versionnumber` DESC, `_file_seq` DESC) AS __rn
  FROM test.staged_a
) WHERE __rn = 1)