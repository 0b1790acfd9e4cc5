from bigdata_elephant_spark.cli import main

raise SystemExit(main())
