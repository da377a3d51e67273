from n_body_problem_tpu.cli import main

raise SystemExit(main())
