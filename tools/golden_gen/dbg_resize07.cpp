#include <cstdio>
#include "line2Dup.cpp"
static void dump_u8(const cv::Mat& m, const char* name){
    FILE* f=fopen(name,"wb");
    int hdr[3]={m.rows,m.cols,m.channels()}; fwrite(hdr,4,3,f);
    fwrite(m.data,1,(size_t)m.rows*m.cols*m.channels(),f); fclose(f);
}
int main(){
    cv::Mat img = cv::imread("/root/reference/test/case0/templ/circle.png");
    for (float s : {0.3f, 0.7f, 0.9f}) {
        cv::Mat r = shape_based_matching::shapeInfo_producer::transform(img, 0, s);
        char buf[64]; snprintf(buf, 64, "dbg_resize_%02d.bin", (int)(s*10));
        dump_u8(r, buf);
        printf("%f -> %dx%d\n", s, r.cols, r.rows);
    }
}
