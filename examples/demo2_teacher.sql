-- Demo 2 — composite row key + bulk load (mirrors the reference's
-- examples/spark-hbase-demo2.md: teacher table keyed by
-- (grade, class, subject), loaded from teacher1k.csv, then the five
-- walkthrough queries: WHERE, LIKE + NOT IN, subquery, GROUP BY,
-- self-join).
--
-- CSV schema (headerless, comma-separated, same shape as the
-- reference's examples/teacher1k.csv):
--   grade,class,subject,teacher_name,teacher_age
-- Generate a deterministic equivalent with:
--   python - <<'PY'
--   with open('/tmp/heracles_teacher.csv', 'w') as f:
--       for g in range(1, 9):
--           for c in range(1, 6):
--               for s in range(1, 31):
--                   f.write(f"{g},{c},subject_{s},"
--                           f"teacher_{g}_{s}_{c},{20 + (g*c+s) % 16}\n")
--   PY
-- then:
--   python -m heracles_spark.cli -e "$(cat examples/demo2_teacher.sql)"

CREATE TABLE teacher (grade INT, class INT, subject STRING,
                      teacher_name STRING, teacher_age INT)
  TBLPROPERTIES('keyCols'='grade;class;subject');

LOAD DATA LOCAL INPATH '/tmp/heracles_teacher.csv' INTO TABLE teacher;

-- (1) test where
SELECT teacher_name, teacher_age FROM teacher
WHERE teacher_age > 25 ORDER BY teacher_name LIMIT 10;

-- (2) test like + not in
SELECT teacher_name, teacher_age, subject FROM teacher
WHERE teacher_name IS NOT NULL
  AND teacher_name LIKE 'teacher_2_3%'
  AND teacher_age NOT IN (20, 21, 22, 23, 24, 25)
ORDER BY teacher_name, subject LIMIT 10;

-- (3) test subquery
SELECT t1.teacher_name, t1.teacher_age
FROM (SELECT * FROM teacher WHERE teacher_name LIKE 'teacher_2_3%') t1
WHERE t1.teacher_age < 25
ORDER BY t1.teacher_name LIMIT 10;

-- (4) test group by
SELECT teacher_name, SUM(teacher_age) AS sum_age FROM teacher
WHERE grade = 1 GROUP BY teacher_name ORDER BY teacher_name LIMIT 10;

-- (5) test join
SELECT t1.teacher_name, t2.subject, t1.teacher_age
FROM (SELECT teacher_name, teacher_age FROM teacher
      WHERE teacher_age >= 26) t1
JOIN (SELECT teacher_name, subject FROM teacher
      WHERE teacher_name LIKE 'teacher_2_3%') t2
  ON t1.teacher_name = t2.teacher_name
ORDER BY t1.teacher_name, t2.subject LIMIT 10;

DROP TABLE teacher;
