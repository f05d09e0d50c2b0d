from logdag_spark.cli import main

raise SystemExit(main())
