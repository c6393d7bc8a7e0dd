#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <cstdio>
int main() {
    cv::RNG rng(123);
    // divisible sizes: 32x48 with 4x2 tiles -> tw=12? cols=48/4=12, rows=32/2=16
    int cases[][4] = {{48,32,4,2},{64,64,8,8},{48,32,3,4},{256,128,8,8}};
    for (auto& c : cases) {
        cv::Mat src(c[1], c[0], CV_8UC1);
        rng.fill(src, cv::RNG::UNIFORM, 0, 256);
        cv::Mat dst;
        cv::createCLAHE(40.0, cv::Size(c[2],c[3]))->apply(src, dst);
        printf("case %d %d %d %d\n", c[0], c[1], c[2], c[3]);
        FILE* f = fopen("dbg2_src.bin","ab"); fwrite(src.data,1,src.total(),f); fclose(f);
        f = fopen("dbg2_dst.bin","ab"); fwrite(dst.data,1,dst.total(),f); fclose(f);
    }
    return 0;
}
