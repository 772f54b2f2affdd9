// Baseline harness: runs the UPSTREAM reference solver (compiled unmodified
// from /root/reference) on a FILE of perturbed initial states — the exact
// x0 distribution bench.py benchmarks (nominal x0 + 0.1 * N(0,1), numpy
// RandomState(0)). Reports, per instance, the reference's success flag,
// iterate count, wall time, final per-player costs, and the final maximum
// constraint violation (the same quantity the AL outer loop thresholds at
// src/augmented_lagrangian_solver.cpp:116-140). This is the evidence that
// backs (or refutes) "tolerance-matched" throughput comparisons on the
// bench distribution, including whether the diverged-lane tail our batched
// solver shows is shipped reference behavior.
//
// Global-state note: Constraint::GlobalMu() is a process-wide static that
// the AL solver scales as it runs; it is reset to kDefaultMu before every
// instance so each solve sees pristine reference initial conditions.
//
// Usage: main_intersection_perturbed x0s.txt [out.jsonl]
//   x0s.txt: one instance per line, 16 whitespace-separated floats.
#include <ilqgames/constraint/constraint.h>
#include <ilqgames/examples/three_player_intersection_example.h>
#include <ilqgames/solver/augmented_lagrangian_solver.h>
#include <ilqgames/solver/problem.h>
#include <ilqgames/solver/solver_params.h>
#include <ilqgames/utils/solver_log.h>
#include <ilqgames/utils/types.h>

#include <chrono>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace {

float MaxConstraintViolation(const ilqgames::Problem& problem,
                             const ilqgames::OperatingPoint& op) {
  // Mirrors the AL outer loop's max_constraint_error computation
  // (src/augmented_lagrangian_solver.cpp:116-140), evaluate-only.
  float max_error = -std::numeric_limits<float>::infinity();
  for (const auto& pc : problem.PlayerCosts()) {
    for (size_t kk = 0; kk < op.xs.size(); kk++) {
      const ilqgames::Time t =
          op.t0 + ilqgames::time::kTimeStep * static_cast<float>(kk);
      for (const auto& constraint : pc.StateConstraints())
        max_error = std::max(max_error, constraint->Evaluate(t, op.xs[kk]));
      for (const auto& pair : pc.ControlConstraints())
        max_error =
            std::max(max_error, pair.second->Evaluate(t, op.us[kk][pair.first]));
    }
  }
  return max_error;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s x0s.txt [out.jsonl]\n", argv[0]);
    return 1;
  }
  std::ifstream in(argv[1]);
  if (!in) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }
  std::ofstream out;
  if (argc > 2) out.open(argv[2]);

  // Shipped exec-main parameters
  // (exec/three_player_intersection/main.cpp:110-121).
  ilqgames::SolverParams params;
  params.max_backtracking_steps = 100;
  params.max_solver_iters = 100;
  params.unconstrained_solver_max_iters = 10;
  params.linesearch = true;
  params.expected_decrease_fraction = 0.001;
  params.initial_alpha_scaling = 0.1;
  params.convergence_tolerance = 1.0;
  params.geometric_mu_scaling = 1.1;
  params.geometric_mu_downscaling = 0.5;
  params.geometric_lambda_downscaling = 0.5;

  std::string line;
  int idx = 0;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    ilqgames::VectorXf x0(16);
    for (int d = 0; d < 16; ++d) ss >> x0(d);

    // Pristine per-instance reference state: fresh problem (fresh
    // lambdas) + reset of the process-global mu.
    ilqgames::Constraint::GlobalMu() = ilqgames::constants::kDefaultMu;
    auto problem =
        std::make_shared<ilqgames::ThreePlayerIntersectionExample>();
    problem->Initialize();
    problem->ResetInitialState(x0);
    ilqgames::AugmentedLagrangianSolver solver(problem, params);

    bool success = false;
    const auto start = std::chrono::high_resolution_clock::now();
    const auto log = solver.Solve(&success);
    const auto end = std::chrono::high_resolution_clock::now();
    const double elapsed = std::chrono::duration<double>(end - start).count();

    const auto costs = log->TotalCosts();
    const float viol =
        MaxConstraintViolation(*problem, log->FinalOperatingPoint());

    char buf[512];
    std::snprintf(buf, sizeof(buf),
                  "{\"i\": %d, \"success\": %d, \"iters\": %zu, "
                  "\"solve_s\": %.4f, \"max_violation\": %.4f, "
                  "\"costs\": [%.4f, %.4f, %.4f]}",
                  idx, (int)success, log->NumIterates(), elapsed, viol,
                  costs[0], costs[1], costs[2]);
    std::puts(buf);
    std::fflush(stdout);
    if (out.is_open()) out << buf << "\n";
    ++idx;
  }
  return 0;
}
