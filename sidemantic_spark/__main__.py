from sidemantic_spark.cli import main

raise SystemExit(main())
