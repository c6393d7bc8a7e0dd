// Stress battery for bit-exact INTER_LINEAR replication: tiny sources,
// extreme scales, and the explicit-dsize path. Test infrastructure only.
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <cstdio>
#include <string>

static void dump_u8(const cv::Mat& m, const std::string& name) {
    FILE* f = fopen(name.c_str(), "wb");
    int hdr[3] = {m.rows, m.cols, m.channels()};
    fwrite(hdr, 4, 3, f);
    CV_Assert(m.isContinuous());
    fwrite(m.data, 1, (size_t)m.rows * m.cols * m.channels(), f);
    fclose(f);
}

int main() {
    cv::RNG rng(777);
    FILE* manifest = fopen("rz2_manifest.txt", "w");
    int n = 0;
    for (int trial = 0; trial < 300; ++trial) {
        int sw = rng.uniform(1, 80);
        int sh = rng.uniform(1, 80);
        int cn = rng.uniform(0, 2) ? 3 : 1;
        cv::Mat src(sh, sw, CV_8UC(cn));
        rng.fill(src, cv::RNG::UNIFORM, 0, 256);
        char buf[128];
        snprintf(buf, 128, "rz2_src_%04d.bin", n);
        dump_u8(src, buf);
        cv::Mat dst;
        if (trial % 3 == 2) {
            int dw = rng.uniform(1, 300), dh = rng.uniform(1, 300);
            cv::resize(src, dst, cv::Size(dw, dh), 0, 0, cv::INTER_LINEAR);
            fprintf(manifest, "%d dsize %d %d\n", n, dw, dh);
        } else {
            double fx = rng.uniform(0.05, 8.0), fy = rng.uniform(0.05, 8.0);
            if (cvRound(sw * fx) < 1 || cvRound(sh * fy) < 1) { continue; }
            cv::resize(src, dst, cv::Size(), fx, fy, cv::INTER_LINEAR);
            fprintf(manifest, "%d fxy %.17g %.17g\n", n, fx, fy);
        }
        snprintf(buf, 128, "rz2_out_%04d.bin", n);
        dump_u8(dst, buf);
        n++;
    }
    fclose(manifest);
    printf("stress battery: %d cases\n", n);
    return 0;
}
