#!/bin/bash
# r15 A/B (r14 verdict #2): the six relational warm deltas r13->r14
# that the canary didn't fully explain, alternated r13-HEAD vs
# r14-HEAD builds in ONE sitting. Relational.scala is untouched
# between the two, so any real delta must reproduce here.
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
R13CP="/root/repo/target/ab_r13/target/scala-2.13/classes:/opt/spark/jars/*"
R14CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
QS="q19_brackets q4_exists_priority q_bloom_semi_revenue q_rollup_revenue q18_large_orders q21_waiting_suppliers"
for q in $QS; do
  for build in r13 r14; do
    CP=$([ $build = r13 ] && echo "$R13CP" || echo "$R14CP")
    echo "== $build $q"
    java $OPENS -Xms8g -Xmx8g -XX:+AlwaysPreTouch -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.tools.TimeQuery "$q" /root/testdata/sf0.1 5 2>/dev/null \
      | grep TIMEQUERY
  done
done
